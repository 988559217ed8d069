package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** Real, pure-JVM video frame extraction for the multimodal operators
  * — the video analog of [[ImageCodec]]/[[AudioCodec]], replacing the
  * last labeled codec stub (the round-7 `StubCodec.sampleFrame` byte
  * slicer) with genuine container parsing and pixel decode.
  *
  * Container: AVI (RIFF) — a PUBLIC layout (Microsoft "AVI RIFF File
  * Reference"), and the one video container a JDK-only engine can
  * decode end-to-end:
  *
  *  - the RIFF chunk walk is the same shape as the WAV parser
  *    ([[graft.plans.MediaOps]] — WAV is RIFF too);
  *  - `hdrl/strl/strh` carries the frame clock as a (scale, rate)
  *    rational — presentation time of frame i is exactly
  *    `i * scale * 1000 / rate` ms, integer arithmetic;
  *  - `strf` is a BITMAPINFOHEADER: width, height, bit depth, and the
  *    codec fourcc;
  *  - `movi` holds one sub-chunk per frame (`##db` uncompressed DIB /
  *    `##dc` compressed).
  *
  * Frame pixel decode, two codecs:
  *
  *  - **DIB / BI_RGB 24-bit** (fourcc 0 or "DIB "): raw bottom-up
  *    BGR rows, each padded to a 4-byte boundary — decoded by a
  *    ~10-line loop, LOSSLESS, so fixture features are closed-form
  *    (the oracle predicts exact per-cell luminance without decoding);
  *  - **MJPG**: each frame chunk is a complete JPEG, decoded by the
  *    proven `javax.imageio` path — deterministic but lossy, so
  *    spec-locked with tolerance (like JPEG stills), never
  *    oracle-hashed.
  *
  * Malformed input returns null at every stage (corrupt media is
  * data, not an error, at corpus scale): every read is bounds-checked
  * and the whole parse is exception-fenced. Decode is per-row CPU
  * inside `mapPartitions` — no shuffle, linear in partitions.
  */
object VideoCodec {

  /** Parsed AVI: stream geometry + frame clock + raw frame payloads.
    * `compression` is 0 for BI_RGB (raw DIB) or the fourcc int
    * (little-endian, as stored) for compressed codecs ("MJPG"). */
  final case class Avi(width: Int, height: Int, bitCount: Int,
                       compression: Int, scale: Int, rate: Int,
                       frames: Array[Array[Byte]]) {
    /** Presentation time of frame i in ms — exact integer rational. */
    def tsMs(i: Int): Int =
      if (rate <= 0) 0 else (i.toLong * scale * 1000L / rate).toInt
  }

  val FccMjpg: Int = fourcc("MJPG")

  private def fourcc(s: String): Int =
    (s(0) & 0xFF) | ((s(1) & 0xFF) << 8) | ((s(2) & 0xFF) << 16) |
      ((s(3) & 0xFF) << 24)

  // ---- bounds-checked little-endian readers ----

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def isFourcc(b: Array[Byte], off: Int, s: String): Boolean =
    (b(off) & 0xFF) == s(0).toInt && (b(off + 1) & 0xFF) == s(1).toInt &&
      (b(off + 2) & 0xFF) == s(2).toInt && (b(off + 3) & 0xFF) == s(3).toInt

  /** Parse an AVI container; null for anything that is not a
    * well-formed AVI with one video stream. Never throws. */
  def parseAvi(bytes: Array[Byte]): Avi =
    try parseAviUnsafe(bytes) catch { case _: Exception => null }

  private def parseAviUnsafe(b: Array[Byte]): Avi = {
    if (b == null || b.length < 24) return null
    if (!isFourcc(b, 0, "RIFF") || !isFourcc(b, 8, "AVI ")) return null
    val end = math.min(b.length.toLong, 8L + (le32(b, 4) & 0xFFFFFFFFL)).toInt

    var width, height, bitCount, compression = 0
    var scale, rate = 0
    var sawVids = false       // strh 'vids' seen, strf still pending
    var haveFmt = false       // video strf captured
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    // iterative chunk walk over a (start, end) window stack — RIFF
    // nesting is data-controlled, so recursion depth must not be
    def walk(start: Int, limit: Int): Unit = {
      var off = start
      var guard = 0
      while (off + 8 <= limit && guard < 100000) {
        guard += 1
        val size = le32(b, off + 4) & 0xFFFFFFFFL
        val dataOff = off + 8
        val dataEnd = dataOff + size
        if (dataEnd > limit || size > Int.MaxValue) return // truncated
        val de = dataEnd.toInt
        if (isFourcc(b, off, "LIST") && size >= 4) {
          // descend into hdrl/strl/movi; skip unknown lists
          if (isFourcc(b, dataOff, "hdrl") || isFourcc(b, dataOff, "strl") ||
              isFourcc(b, dataOff, "movi"))
            walk(dataOff + 4, de)
        } else if (isFourcc(b, off, "strh") && size >= 48) {
          // only the FIRST video stream's header feeds the clock
          if (!haveFmt && isFourcc(b, dataOff, "vids")) {
            sawVids = true
            scale = le32(b, dataOff + 20)
            rate = le32(b, dataOff + 24)
          } else sawVids = false
        } else if (isFourcc(b, off, "strf") && size >= 40 && sawVids &&
            !haveFmt) {
          // BITMAPINFOHEADER of the video stream just announced
          width = le32(b, dataOff + 4)
          height = le32(b, dataOff + 8)
          bitCount = le16(b, dataOff + 14) // biBitCount, 16-bit at +14
          compression = le32(b, dataOff + 16)
          haveFmt = true
          sawVids = false
        } else if (size >= 0 && off + 4 <= limit &&
            (b(off + 2) == 'd'.toByte &&
              (b(off + 3) == 'b'.toByte || b(off + 3) == 'c'.toByte)) &&
            b(off) >= '0'.toByte && b(off) <= '9'.toByte &&
            b(off + 1) >= '0'.toByte && b(off + 1) <= '9'.toByte) {
          // movi frame chunk '##db'/'##dc' — copy the payload
          frames += java.util.Arrays.copyOfRange(b, dataOff, de)
        }
        off = de + (size & 1L).toInt // chunks are word-aligned
      }
    }
    walk(12, end)

    if (!haveFmt || width <= 0 || height <= 0) null
    else Avi(width, height, bitCount, compression, scale, rate,
      frames.toArray)
  }

  /** Decode frame i of a parsed AVI to pixels; null if the frame is
    * missing, the codec is unsupported, or the payload is corrupt. */
  def decodeFrame(avi: Avi, i: Int): BufferedImage = {
    if (avi == null || i < 0 || i >= avi.frames.length) return null
    val data = avi.frames(i)
    try {
      if (avi.compression == 0 && avi.bitCount == 24)
        decodeDib24(data, avi.width, avi.height)
      else if (avi.compression == FccMjpg)
        ImageCodec.decodeImage(data) // complete JPEG per chunk
      else null
    } catch { case _: Exception => null }
  }

  /** Raw BI_RGB 24-bit DIB: bottom-up BGR rows padded to 4 bytes. */
  private def decodeDib24(data: Array[Byte], w: Int, h: Int): BufferedImage = {
    val stride = ((w * 3 + 3) / 4) * 4
    if (w <= 0 || h <= 0 || w > (1 << 16) || h > (1 << 16) ||
        data.length < stride.toLong * h) return null
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val row = (h - 1 - y) * stride // bottom-up storage
      var x = 0
      while (x < w) {
        val p = row + x * 3
        img.setRGB(x, y, ((data(p + 2) & 0xFF) << 16) |
          ((data(p + 1) & 0xFF) << 8) | (data(p) & 0xFF))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Per-frame features: (frame_index, ts_ms, payload_bytes,
    * luma grid or null). One container decode, all frames. Null for
    * non-AVI payloads. */
  def frameFeatures(bytes: Array[Byte])
      : Array[(Int, Int, Int, Array[Float])] = {
    val avi = parseAvi(bytes)
    if (avi == null) null
    else Array.tabulate(avi.frames.length) { i =>
      val img = decodeFrame(avi, i)
      (i, avi.tsMs(i), avi.frames(i).length,
        if (img == null) null else ImageCodec.lumaGrid(img))
    }
  }

  // ---- fixture encoder (real AVI writer, JDK-only) ----

  /** Encode a real AVI: one video stream, one `##db` (DIB) or `##dc`
    * (MJPG) chunk per frame, honest header fields throughout. Frames
    * are (topRgb, bottomRgb) blocks like the ImageCodec fixtures —
    * closed-form decodable for DIB. `scale`/`rate` set the frame
    * clock (frame i at `i*scale*1000/rate` ms). */
  def encodeAvi(w: Int, h: Int, frameColors: Seq[(Int, Int)],
                scale: Int, rate: Int, mjpg: Boolean = false): Array[Byte] =
    if (mjpg)
      encodeAviPayloads(w, h,
        frameColors.map(c => ImageCodec.encodeJpeg(w, h, c._1, c._2)),
        scale, rate, mjpg = true)
    else
      encodeAviBands(w, h, frameColors.map(c => Seq(c._1, c._2)),
        scale, rate)

  /** DIB-frame AVI with `bands.length` equal horizontal color bands
    * per frame (row y takes band `y*n/h` in image space) — the
    * closed-form fixture shape the perceptual-hash oracles use. */
  def encodeAviBands(w: Int, h: Int, frames: Seq[Seq[Int]],
                     scale: Int, rate: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val payloads: Seq[Array[Byte]] = frames.map { colors =>
      val d = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val rgb = colors(y * colors.length / h)  // band in IMAGE space
        val row = (h - 1 - y) * stride           // stored bottom-up
        var x = 0
        while (x < w) {
          val p = row + x * 3                    // DIB pixel order B,G,R;
          d(p) = rgb.toByte                      // rgb int is 0xRRGGBB
          d(p + 1) = (rgb >> 8).toByte
          d(p + 2) = (rgb >> 16).toByte
          x += 1
        }
        y += 1
      }
      d
    }
    encodeAviPayloads(w, h, payloads, scale, rate, mjpg = false)
  }

  private def encodeAviPayloads(w: Int, h: Int,
                                payloads: Seq[Array[Byte]],
                                scale: Int, rate: Int,
                                mjpg: Boolean): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val n = payloads.length
    val maxPayload = if (n == 0) 0 else payloads.map(_.length).max

    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v); w16(v >> 16) }
    def tag(s: String): Unit = s.foreach(c => out.write(c & 0xFF))

    val strhSize = 56
    val strfSize = 40
    val avihSize = 56
    val strlSize = 4 + (8 + strhSize) + (8 + strfSize)
    val hdrlSize = 4 + (8 + avihSize) + (8 + strlSize)
    val moviSize = 4 + payloads.map(p => 8 + p.length + (p.length & 1)).sum
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)

    tag("RIFF"); w32(riffSize); tag("AVI ")
    tag("LIST"); w32(hdrlSize); tag("hdrl")
    tag("avih"); w32(avihSize)
    w32(if (rate <= 0) 0 else (scale.toLong * 1000000L / rate).toInt) // usec/frame
    w32(0); w32(0); w32(0)          // maxBytesPerSec, padding, flags
    w32(n); w32(0); w32(1)          // totalFrames, initialFrames, streams
    w32(maxPayload); w32(w); w32(h) // suggestedBuffer, width, height
    w32(0); w32(0); w32(0); w32(0)  // reserved[4]
    tag("LIST"); w32(strlSize); tag("strl")
    tag("strh"); w32(strhSize)
    tag("vids"); tag(if (mjpg) "MJPG" else "DIB ")
    w32(0); w16(0); w16(0); w32(0)  // flags, priority, language, initialFrames
    w32(scale); w32(rate); w32(0); w32(n) // scale, rate, start, length
    w32(maxPayload); w32(-1); w32(0)      // suggestedBuffer, quality, sampleSize
    w16(0); w16(0); w16(w); w16(h)        // rcFrame
    tag("strf"); w32(strfSize)
    w32(40); w32(w); w32(h); w16(1); w16(24) // biSize..biBitCount
    w32(if (mjpg) FccMjpg else 0)            // biCompression
    w32(stride * h); w32(0); w32(0); w32(0); w32(0)
    tag("LIST"); w32(moviSize); tag("movi")
    payloads.foreach { p =>
      tag(if (mjpg) "00dc" else "00db"); w32(p.length); out.write(p)
      if ((p.length & 1) == 1) out.write(0) // word alignment pad
    }
    out.toByteArray
  }
}
