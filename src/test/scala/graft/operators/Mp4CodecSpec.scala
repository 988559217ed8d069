package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Byte-level lock on the MP4 sample-table codec: the ISO-BMFF box
  * walk, stsd/stts/stsc/stsz/stco expansion, the `'raw '` RGB24 and
  * MJPEG sample decoders, and the media-timescale frame clock. Pixel
  * correctness here; the oracle-facing query (q_multimodal_frames MP4
  * rows) then locks the lossless path against DuckDB. */
class Mp4CodecSpec extends AnyFunSuite {

  private def lum(rgb: Int): Int =
    299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
      114 * (rgb & 0xFF)

  private def bands(pairs: (Int, Int)*): Seq[Seq[Int]] =
    pairs.map(p => Seq(p._1, p._2))

  test("'raw ' MP4 round-trips bit-exactly: geometry, clock, pixels") {
    val colors = Seq((0x112233, 0x445566), (0xABCDEF, 0x000000),
      (0xFF00FF, 0x00FF00))
    val b = Mp4Codec.encodeMp4Bands(32, 16, bands(colors: _*),
      timescale = 1000, deltas = Seq(40, 40, 40))
    val m = Mp4Codec.parseMp4Video(b)
    assert(m != null)
    assert(m.width == 32 && m.height == 16 && m.format == "raw ")
    assert(m.timescale == 1000 && m.samples.length == 3)
    assert((0 until 3).map(m.tsMs) == Seq(0, 40, 80))
    colors.zipWithIndex.foreach { case ((top, bottom), i) =>
      val img = Mp4Codec.decodeFrame(m, i)
      assert(img.getWidth == 32 && img.getHeight == 16)
      assert((img.getRGB(0, 0) & 0xFFFFFF) == top)
      assert((img.getRGB(31, 15) & 0xFFFFFF) == bottom)
      assert((img.getRGB(5, 7) & 0xFFFFFF) == top)
      assert((img.getRGB(5, 8) & 0xFFFFFF) == bottom)
    }
  }

  test("non-ms timescale converts with floor division") {
    val b = Mp4Codec.encodeMp4Bands(16, 16, bands((1, 2), (3, 4), (5, 6)),
      timescale = 600, deltas = Seq(60, 60, 120))
    val m = Mp4Codec.parseMp4Video(b)
    // 0, 60, 120 units at 600 units/s -> 0, 100, 200 ms
    assert((0 until 3).map(m.tsMs) == Seq(0, 100, 200))
    val b2 = Mp4Codec.encodeMp4Bands(16, 16, bands((1, 2), (3, 4)),
      timescale = 800, deltas = Seq(100, 100))
    // 100*1000/800 = 125
    assert(Mp4Codec.parseMp4Video(b2).tsMs(1) == 125)
  }

  test("multi-run stts expands run-length deltas") {
    // deltas 10,10,30,30 -> runs (2,10),(2,30); starts 0,10,20,50
    val b = Mp4Codec.encodeMp4Bands(16, 16,
      bands((1, 2), (3, 4), (5, 6), (7, 8)),
      timescale = 1000, deltas = Seq(10, 10, 30, 30))
    val m = Mp4Codec.parseMp4Video(b)
    assert(m.startUnits.toSeq == Seq(0L, 10L, 20L, 50L))
    // the native timeline expression agrees on the same bytes
    val native = graft.plans.MediaOps.mp4SampleTimesMs(b)
    assert(native.toSeq == (0 until 4).map(m.tsMs))
  }

  test("stsc chunk runs expand for odd sample counts and spc variants") {
    for (n <- 1 to 5; spc <- Seq(1, 2, 3)) {
      val colors = (0 until n).map(i => (0x010101 * (i + 1), 0x0F0F0F))
      val b = Mp4Codec.encodeMp4Bands(16, 16, bands(colors: _*),
        timescale = 1000, deltas = Seq.fill(n)(40), samplesPerChunk = spc)
      val m = Mp4Codec.parseMp4Video(b)
      assert(m != null && m.samples.length == n, s"n=$n spc=$spc")
      colors.zipWithIndex.foreach { case ((top, _), i) =>
        val img = Mp4Codec.decodeFrame(m, i)
        assert((img.getRGB(0, 0) & 0xFFFFFF) == top, s"n=$n spc=$spc i=$i")
      }
    }
  }

  test("frameFeatures: one parse, all samples, exact grids") {
    val colors = Seq((0x204060, 0x608020), (0x010203, 0x040506))
    val fs = Mp4Codec.frameFeatures(
      Mp4Codec.encodeMp4Bands(16, 16, bands(colors: _*),
        timescale = 1000, deltas = Seq(25, 25)))
    assert(fs.length == 2)
    fs.zip(colors).zipWithIndex.foreach { case (((i, ts, len, f), (t, b)), k) =>
      assert(i == k && ts == k * 25 && len == 3 * 16 * 16)
      assert(f.take(32).forall(_ == lum(t).toFloat))
      assert(f.drop(32).forall(_ == lum(b).toFloat))
    }
  }

  test("MJPEG samples decode through ImageIO: lossy but close") {
    val c = 0x808080
    val b = Mp4Codec.encodeMp4Mjpeg(32, 32, Seq((c, c), (c, c)),
      timescale = 1000, deltas = Seq(40, 40))
    val m = Mp4Codec.parseMp4Video(b)
    assert(m != null && m.format == "jpeg" && m.samples.length == 2)
    (0 until 2).foreach { i =>
      val f = ImageCodec.lumaGrid(Mp4Codec.decodeFrame(m, i))
      assert(f.forall(v => math.abs(v - lum(c)) <= 4000),
        s"mjpeg cells ${f.take(4).toSeq} vs ${lum(c)}")
    }
  }

  test("unsupported sample codec parses but decodes null (avc1 boundary)") {
    val payloads = Seq(Array.fill[Byte](64)(7), Array.fill[Byte](48)(9))
    val b = Mp4Codec.encodeMp4(16, 16, payloads, "avc1",
      timescale = 1000, deltas = Seq(40, 40))
    val m = Mp4Codec.parseMp4Video(b)
    assert(m != null && m.format == "avc1")
    assert(m.samples(0).length == 64 && m.samples(1).length == 48)
    assert((0 until 2).map(m.tsMs) == Seq(0, 40)) // timeline still real
    assert(Mp4Codec.decodeFrame(m, 0) == null)    // pixels: JVM boundary
    val fs = Mp4Codec.frameFeatures(b)
    assert(fs.length == 2 && fs.forall(_._4 == null))
  }

  test("header metadata parser reads the same encoded bytes") {
    // the stsd-era encoder must stay consistent with parseHeader's
    // mvhd/tkhd walk (format/width/height/duration)
    val b = Mp4Codec.encodeMp4Bands(48, 32, bands((1, 2), (3, 4)),
      timescale = 500, deltas = Seq(50, 50)) // 100 units @500 = 200 ms
    val row = graft.plans.MediaOps.parseHeader(b)
    assert(row != null)
    assert(row.getUTF8String(0).toString == "mp4")
    assert(row.getInt(1) == 48 && row.getInt(2) == 32)
    assert(row.getInt(6) == 200)
  }

  test("malformed input returns null, never throws") {
    val good = Mp4Codec.encodeMp4Bands(16, 16, bands((1, 2)),
      timescale = 1000, deltas = Seq(40))
    assert(Mp4Codec.parseMp4Video(null) == null)
    assert(Mp4Codec.parseMp4Video(Array.emptyByteArray) == null)
    assert(Mp4Codec.parseMp4Video(Array.fill[Byte](40)(1)) == null)
    // truncations at every prefix must be fenced
    for (cut <- Seq(10, 40, good.length / 2, good.length - 3))
      assert(Mp4Codec.parseMp4Video(good.take(cut)) == null, s"cut=$cut")
    // flipped box tags degrade to null, not garbage
    val noMoov = good.clone()
    val moovIdx = good.indexOfSlice("moov".getBytes)
    noMoov(moovIdx) = 'X'.toByte
    assert(Mp4Codec.parseMp4Video(noMoov) == null)
  }
}
