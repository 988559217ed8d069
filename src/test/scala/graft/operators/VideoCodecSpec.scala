package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level lock on the AVI codec: the RIFF walk, the DIB and MJPG
  * frame decoders, the strh frame clock, and the resize resampler.
  * Decode correctness at the PIXEL level — the oracle-facing query
  * (q_multimodal_frames) then locks the same path against DuckDB. */
class VideoCodecSpec extends AnyFunSuite {

  private def lum(rgb: Int): Int =
    299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
      114 * (rgb & 0xFF)

  test("DIB AVI round-trips bit-exactly: geometry, clock, pixels") {
    val colors = Seq((0x112233, 0x445566), (0xABCDEF, 0x000000),
      (0xFF00FF, 0x00FF00))
    val avi = VideoCodec.parseAvi(
      VideoCodec.encodeAvi(32, 16, colors, scale = 1, rate = 25))
    assert(avi != null)
    assert(avi.width == 32 && avi.height == 16 && avi.bitCount == 24)
    assert(avi.compression == 0 && avi.frames.length == 3)
    assert((0 until 3).map(avi.tsMs) == Seq(0, 40, 80))
    colors.zipWithIndex.foreach { case ((top, bottom), i) =>
      val img = VideoCodec.decodeFrame(avi, i)
      assert(img.getWidth == 32 && img.getHeight == 16)
      assert((img.getRGB(0, 0) & 0xFFFFFF) == top)       // top-left
      assert((img.getRGB(31, 15) & 0xFFFFFF) == bottom)  // bottom-right
      assert((img.getRGB(5, 7) & 0xFFFFFF) == top)       // last top row
      assert((img.getRGB(5, 8) & 0xFFFFFF) == bottom)    // first bottom row
    }
  }

  test("DIB width not a multiple of 4 exercises row padding") {
    // w=9: stride = ((27+3)/4)*4 = 28, 1 pad byte per row
    val avi = VideoCodec.parseAvi(
      VideoCodec.encodeAvi(9, 6, Seq((0x803020, 0x102030)), 1, 10))
    assert(avi != null && avi.frames.head.length == 28 * 6)
    val img = VideoCodec.decodeFrame(avi, 0)
    assert((img.getRGB(8, 0) & 0xFFFFFF) == 0x803020)
    assert((img.getRGB(0, 5) & 0xFFFFFF) == 0x102030)
  }

  test("MJPG frames decode through ImageIO: lossy but close") {
    val c = 0x808080
    val avi = VideoCodec.parseAvi(
      VideoCodec.encodeAvi(32, 32, Seq((c, c), (c, c)), 1, 10, mjpg = true))
    assert(avi != null && avi.compression == VideoCodec.FccMjpg)
    assert(avi.frames.length == 2)
    (0 until 2).foreach { i =>
      val f = ImageCodec.lumaGrid(VideoCodec.decodeFrame(avi, i))
      assert(f.forall(v => math.abs(v - lum(c)) <= 4000),
        s"mjpg cells ${f.take(4).toSeq} vs ${lum(c)}")
    }
  }

  test("frameFeatures: one parse, all frames, exact grids") {
    val colors = Seq((0x204060, 0x608020), (0x010203, 0x040506))
    val fs = VideoCodec.frameFeatures(
      VideoCodec.encodeAvi(16, 16, colors, scale = 1, rate = 40))
    assert(fs.length == 2)
    fs.zip(colors).zipWithIndex.foreach { case (((i, ts, len, f), (t, b)), k) =>
      assert(i == k && ts == k * 25 && len == 48 * 16)
      assert(f.take(32).forall(_ == lum(t).toFloat))
      assert(f.drop(32).forall(_ == lum(b).toFloat))
    }
  }

  test("zero-frame and zero-rate AVIs are well-formed, not errors") {
    val empty = VideoCodec.parseAvi(VideoCodec.encodeAvi(8, 8, Nil, 1, 10))
    assert(empty != null && empty.frames.isEmpty)
    val noRate = VideoCodec.parseAvi(
      VideoCodec.encodeAvi(8, 8, Seq((1, 2)), 1, 0))
    assert(noRate != null && noRate.tsMs(3) == 0) // clockless -> ts 0
  }

  test("malformed input returns null, never throws") {
    val good = VideoCodec.encodeAvi(16, 16, Seq((0x111111, 0x222222)), 1, 10)
    assert(VideoCodec.parseAvi(null) == null)
    assert(VideoCodec.parseAvi(Array.emptyByteArray) == null)
    assert(VideoCodec.parseAvi("RIFFxxxxWAVE".getBytes) == null)
    (0 until good.length by 7).foreach { cut =>
      VideoCodec.parseAvi(good.take(cut)) // truncations: null or partial, no throw
    }
    // declared chunk size beyond the buffer -> truncated walk, no throw
    val lying = good.clone()
    lying(4) = 0xFF.toByte; lying(5) = 0xFF.toByte
    VideoCodec.parseAvi(lying)
    // frame index out of range / corrupt frame payload
    val avi = VideoCodec.parseAvi(good)
    assert(VideoCodec.decodeFrame(avi, -1) == null)
    assert(VideoCodec.decodeFrame(avi, 99) == null)
    assert(VideoCodec.decodeFrame(null, 0) == null)
  }

  test("resample: explicit integer NN map, exact on integer ratios") {
    val img = ImageCodec.decodeImage(
      ImageCodec.encodePng(64, 32, 0xC08040, 0x4080C0))
    val half = ImageCodec.resample(img, 32, 16)
    assert(half.getWidth == 32 && half.getHeight == 16)
    assert((half.getRGB(0, 0) & 0xFFFFFF) == 0xC08040)
    assert((half.getRGB(31, 7) & 0xFFFFFF) == 0xC08040)  // last top row
    assert((half.getRGB(0, 8) & 0xFFFFFF) == 0x4080C0)   // first bottom row
    assert((half.getRGB(31, 15) & 0xFFFFFF) == 0x4080C0)
  }

  test("resizeBytes: caps longest side, floors the short side, no-ops in-bounds") {
    val big = ImageCodec.encodePng(64, 32, 0x010203, 0x010203)
    val out = ImageCodec.decodeImage(ImageCodec.resizeBytes(big, 32))
    assert(out.getWidth == 32 && out.getHeight == 16)
    val small = ImageCodec.encodePng(20, 10, 0x010203, 0x010203)
    assert(ImageCodec.resizeBytes(small, 32) eq small) // identical reference
    // non-square floor: 30x20 capped at 8 -> (8, floor(20*8/30)=5)
    val odd = ImageCodec.decodeImage(
      ImageCodec.resizeBytes(ImageCodec.encodePng(30, 20, 0xAAAAAA, 0xAAAAAA), 8))
    assert(odd.getWidth == 8 && odd.getHeight == 5)
    assert(ImageCodec.resizeBytes(Array[Byte](1, 2, 3), 32) == null)
  }
}
