package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** Real, pure-JVM MP4 (ISO-BMFF) video frame extraction — closes the
  * round-8 "MP4 frame pixels" boundary: where [[VideoCodec]] walks the
  * RIFF layout, this walks the published ISO/IEC 14496-12 box ladder
  * `moov → trak → mdia → { mdhd, minf → stbl → { stsd, stts, stsc,
  * stsz, stco } }` and slices each sample's bytes straight out of
  * `mdat` via the sample table:
  *
  *  - `stsd` names the sample codec (fourcc) and carries the visual
  *    sample entry's width/height;
  *  - `stts` gives per-sample durations in MEDIA timescale units
  *    (mdhd), expanded to cumulative presentation times;
  *  - `stsc` maps chunks to samples-per-chunk (run-length encoded —
  *    the walk expands the runs, not just the 1-sample-per-chunk
  *    special case);
  *  - `stsz` gives per-sample byte sizes;
  *  - `stco` gives ABSOLUTE file offsets of each chunk; samples are
  *    consecutive within a chunk.
  *
  * Sample codecs, mirroring the AVI pair exactly:
  *
  *  - **`'raw '` (QuickTime uncompressed RGB, depth 24)**: top-down
  *    RGB rows, 3·w bytes per row — LOSSLESS, decoded by a short
  *    loop, so fixture features are closed-form and the DuckDB oracle
  *    predicts exact per-cell luminance without decoding;
  *  - **`'jpeg'` (MJPEG-in-MP4)**: each sample is a complete JPEG,
  *    decoded by the proven `javax.imageio` path — deterministic but
  *    lossy, so spec-locked with tolerance, never oracle-hashed.
  *
  * H.264/HEVC (`avc1`/`hvc1`) remain a PERMANENT boundary: the JDK
  * ships no inter-frame video codec, and implementing one is far out
  * of engine scope — such samples parse (times, sizes, offsets all
  * real) but decode to null features, the same
  * corrupt-media-is-data-not-an-error policy as every other codec
  * edge. Malformed input returns null at every stage; every read is
  * bounds-checked and the parse is exception-fenced.
  */
object Mp4Codec {

  /** Parsed MP4 video track: geometry + codec + media clock + raw
    * sample payloads. `tsMs(i)` is the exact integer presentation
    * time of sample i: cumulative stts deltas × 1000 / timescale. */
  final case class Mp4Video(width: Int, height: Int, format: String,
                            timescale: Long, startUnits: Array[Long],
                            samples: Array[Array[Byte]]) {
    def tsMs(i: Int): Int =
      if (timescale <= 0) 0 else (startUnits(i) * 1000L / timescale).toInt
  }

  /** Header-claimed sample counts above this parse as malformed
    * rather than allocated (same policy as MediaOps.MaxTimelineSamples). */
  val MaxSamples: Int = 1 << 20

  // ---- bounds-checked big-endian readers ----
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def u32(b: Array[Byte], i: Int): Long = be32(b, i) & 0xFFFFFFFFL
  private def boxIs(b: Array[Byte], off: Int, t: String): Boolean =
    (b(off + 4) & 0xFF) == t(0).toInt && (b(off + 5) & 0xFF) == t(1).toInt &&
      (b(off + 6) & 0xFF) == t(2).toInt && (b(off + 7) & 0xFF) == t(3).toInt
  private def boxEnd(b: Array[Byte], off: Int, limit: Int): Int = {
    if (off + 8 > limit) return -1
    val size = u32(b, off)
    if (size < 8 || off + size > limit) -1 else (off + size).toInt
  }
  /** First child box of type `t` inside (parent+8, parentEnd). */
  private def child(b: Array[Byte], parent: Int, parentEnd: Int,
                    t: String): Int = {
    var c = parent + 8
    while (c < parentEnd) {
      val end = boxEnd(b, c, parentEnd)
      if (end < 0) return -1
      if (boxIs(b, c, t)) return c
      c = end
    }
    -1
  }

  /** Parse the first video track's sample table; null for anything
    * that is not a well-formed MP4 with a usable stbl. Never throws. */
  def parseMp4Video(bytes: Array[Byte]): Mp4Video =
    try parseUnsafe(bytes) catch { case _: Exception => null }

  private def parseUnsafe(b: Array[Byte]): Mp4Video = {
    if (b == null || b.length < 12 ||
        !(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'))
      return null
    // top-level walk to moov
    var off = 0
    var moovS = -1; var moovE = -1
    while (off < b.length && moovS < 0) {
      val end = boxEnd(b, off, b.length)
      if (end < 0) return null
      if (boxIs(b, off, "moov")) { moovS = off; moovE = end }
      off = end
    }
    if (moovS < 0) return null
    val trak = child(b, moovS, moovE, "trak")
    if (trak < 0) return null
    val trakE = boxEnd(b, trak, moovE)
    val mdia = child(b, trak, trakE, "mdia")
    if (mdia < 0) return null
    val mdiaE = boxEnd(b, mdia, trakE)
    val mdhd = child(b, mdia, mdiaE, "mdhd")
    if (mdhd < 0) return null
    val mdhdE = boxEnd(b, mdhd, mdiaE)
    val mdhdV = b(mdhd + 8) & 0xFF
    val timescale =
      if (mdhdV == 1 && mdhdE - mdhd >= 32) u32(b, mdhd + 28)
      else if (mdhdE - mdhd >= 24) u32(b, mdhd + 20)
      else return null
    val minf = child(b, mdia, mdiaE, "minf")
    if (minf < 0) return null
    val minfE = boxEnd(b, minf, mdiaE)
    val stbl = child(b, minf, minfE, "stbl")
    if (stbl < 0) return null
    val stblE = boxEnd(b, stbl, minfE)

    // stsd: first visual sample entry -> fourcc + dims
    val stsd = child(b, stbl, stblE, "stsd")
    if (stsd < 0 || boxEnd(b, stsd, stblE) - stsd < 16 + 86) return null
    val entry = stsd + 16 // fullbox(12) + entry_count(4)
    val format = new String(Array(b(entry + 4), b(entry + 5),
      b(entry + 6), b(entry + 7)), java.nio.charset.StandardCharsets.US_ASCII)
    val width = be16(b, entry + 32)  // after 6 reserved + dref idx + 16 predefined
    val height = be16(b, entry + 34)

    // stts -> cumulative start times in media units
    val stts = child(b, stbl, stblE, "stts")
    if (stts < 0) return null
    val sttsE = boxEnd(b, stts, stblE)
    val nRuns = be32(b, stts + 12)
    if (nRuns < 0 || stts + 16 + nRuns * 8L > sttsE) return null
    var total = 0L
    var e = 0
    while (e < nRuns) {
      total += u32(b, stts + 16 + e * 8)
      if (total > MaxSamples) return null
      e += 1
    }
    val n = total.toInt
    val starts = new Array[Long](n)
    var t = 0L; var idx = 0; e = 0
    while (e < nRuns) {
      val cnt = be32(b, stts + 16 + e * 8)
      val delta = u32(b, stts + 20 + e * 8)
      var i = 0
      while (i < cnt) { starts(idx) = t; t += delta; idx += 1; i += 1 }
      e += 1
    }

    // stsz -> per-sample sizes (fixed or table)
    val stsz = child(b, stbl, stblE, "stsz")
    if (stsz < 0) return null
    val stszE = boxEnd(b, stsz, stblE)
    val fixedSize = u32(b, stsz + 12)
    val stszN = be32(b, stsz + 16)
    if (stszN != n) return null
    val sizes = new Array[Int](n)
    if (fixedSize != 0) java.util.Arrays.fill(sizes, fixedSize.toInt)
    else {
      if (stsz + 20 + n * 4L > stszE) return null
      var i = 0
      while (i < n) { sizes(i) = be32(b, stsz + 20 + i * 4); i += 1 }
    }

    // stco chunk offsets + stsc run-length chunk->samples map
    val stco = child(b, stbl, stblE, "stco")
    if (stco < 0) return null
    val stcoE = boxEnd(b, stco, stblE)
    val nChunks = be32(b, stco + 12)
    if (nChunks < 0 || stco + 16 + nChunks * 4L > stcoE) return null
    val stsc = child(b, stbl, stblE, "stsc")
    if (stsc < 0) return null
    val stscE = boxEnd(b, stsc, stblE)
    val nMap = be32(b, stsc + 12)
    if (nMap <= 0 || stsc + 16 + nMap * 12L > stscE) return null

    // expand: for chunk c (1-based), samples_per_chunk is the entry
    // with the largest first_chunk <= c (runs are sorted)
    val samples = new Array[Array[Byte]](n)
    var sIdx = 0
    var mapIdx = 0
    var c = 1
    while (c <= nChunks && sIdx < n) {
      while (mapIdx + 1 < nMap &&
             be32(b, stsc + 16 + (mapIdx + 1) * 12) <= c) mapIdx += 1
      val spc = be32(b, stsc + 16 + mapIdx * 12 + 4)
      if (spc <= 0 || spc > n) return null
      var sampleOff = u32(b, stco + 16 + (c - 1) * 4)
      var k = 0
      while (k < spc && sIdx < n) {
        val sz = sizes(sIdx)
        if (sz < 0 || sampleOff + sz > b.length) return null
        samples(sIdx) = java.util.Arrays.copyOfRange(
          b, sampleOff.toInt, (sampleOff + sz).toInt)
        sampleOff += sz
        sIdx += 1
        k += 1
      }
      c += 1
    }
    if (sIdx != n) return null
    Mp4Video(width, height, format, timescale, starts, samples)
  }

  /** Decode sample i to pixels; null if missing, unsupported codec
    * (`avc1`/`hvc1`/... — the permanent pure-JVM boundary), or corrupt. */
  def decodeFrame(m: Mp4Video, i: Int): BufferedImage = {
    if (m == null || i < 0 || i >= m.samples.length) return null
    try {
      m.format match {
        case "raw " => decodeRaw24(m.samples(i), m.width, m.height)
        case "jpeg" => ImageCodec.decodeImage(m.samples(i))
        case _      => null
      }
    } catch { case _: Exception => null }
  }

  /** QuickTime `'raw '` depth-24: top-down RGB rows, 3·w bytes/row. */
  private def decodeRaw24(d: Array[Byte], w: Int, h: Int): BufferedImage = {
    if (w <= 0 || h <= 0 || w > (1 << 16) || h > (1 << 16) ||
        d.length < 3L * w * h) return null
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      val row = y * w * 3
      var x = 0
      while (x < w) {
        val p = row + x * 3
        img.setRGB(x, y, ((d(p) & 0xFF) << 16) |
          ((d(p + 1) & 0xFF) << 8) | (d(p + 2) & 0xFF))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Per-sample features: (frame_index, ts_ms, payload_bytes,
    * luma grid or null) — the [[VideoCodec.frameFeatures]] shape, so
    * the Multimodal operators dispatch on container transparently. */
  def frameFeatures(bytes: Array[Byte])
      : Array[(Int, Int, Int, Array[Float])] = {
    val m = parseMp4Video(bytes)
    if (m == null) null
    else Array.tabulate(m.samples.length) { i =>
      val img = decodeFrame(m, i)
      (i, m.tsMs(i), m.samples(i).length,
        if (img == null) null else ImageCodec.lumaGrid(img))
    }
  }

  // ---- fixture encoder (real ISO-BMFF writer, JDK-only) ----

  /** Encode a real MP4: `ftyp` + `mdat` (all samples) + `moov` with a
    * complete sample table — honest box sizes and ABSOLUTE `stco`
    * offsets throughout (mdat precedes moov so offsets don't depend
    * on moov's size). `deltas` are per-sample durations in `timescale`
    * units; `samplesPerChunk` > 1 exercises the stsc run expansion. */
  def encodeMp4(w: Int, h: Int, payloads: Seq[Array[Byte]], format: String,
                timescale: Int, deltas: Seq[Int],
                samplesPerChunk: Int = 2): Array[Byte] = {
    require(format.length == 4, "fourcc must be 4 chars")
    require(payloads.length == deltas.length, "one delta per sample")
    require(samplesPerChunk >= 1, "samplesPerChunk >= 1")
    val n = payloads.length
    val durUnits = deltas.map(_.toLong).sum
    val durMovie = // movie timescale is 1000 (ms)
      if (timescale <= 0) 0L else durUnits * 1000L / timescale

    def box(tag: String, body: Array[Byte]*): Array[Byte] = {
      val size = 8 + body.map(_.length).sum
      val o = new ByteArrayOutputStream(size)
      o.write(size >> 24); o.write((size >> 16) & 0xFF)
      o.write((size >> 8) & 0xFF); o.write(size & 0xFF)
      tag.foreach(ch => o.write(ch & 0xFF))
      body.foreach(o.write)
      o.toByteArray
    }
    def bytesOf(f: ByteArrayOutputStream => Unit): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      f(o)
      o.toByteArray
    }
    def w16(o: ByteArrayOutputStream, v: Int): Unit = {
      o.write((v >> 8) & 0xFF); o.write(v & 0xFF)
    }
    def w32(o: ByteArrayOutputStream, v: Long): Unit = {
      o.write(((v >> 24) & 0xFF).toInt); o.write(((v >> 16) & 0xFF).toInt)
      o.write(((v >> 8) & 0xFF).toInt); o.write((v & 0xFF).toInt)
    }

    val ftyp = box("ftyp", bytesOf { o =>
      "isom".foreach(c => o.write(c & 0xFF)); w32(o, 0)
    })
    val mdat = box("mdat", payloads.toArray.flatten)
    // absolute chunk offsets: ftyp + mdat header, then cumulative
    val chunkOffsets = {
      val offs = scala.collection.mutable.ArrayBuffer.empty[Long]
      var pos = ftyp.length + 8L
      var i = 0
      while (i < n) {
        if (i % samplesPerChunk == 0) offs += pos
        pos += payloads(i).length
        i += 1
      }
      offs.toSeq
    }

    val identity = bytesOf { o =>
      w32(o, 0x00010000L); w32(o, 0); w32(o, 0)
      w32(o, 0); w32(o, 0x00010000L); w32(o, 0)
      w32(o, 0); w32(o, 0); w32(o, 0x40000000L)
    }
    val mvhd = box("mvhd", bytesOf { o =>
      w32(o, 0); w32(o, 0); w32(o, 0)        // v0+flags, ctime, mtime
      w32(o, 1000); w32(o, durMovie)         // movie timescale ms
      w32(o, 0x00010000L); w16(o, 0x0100); w16(o, 0)
      w32(o, 0); w32(o, 0)
      o.write(identity, 0, identity.length)
      for (_ <- 0 until 6) w32(o, 0)         // pre_defined
      w32(o, 2)                              // next track id
    })
    val tkhd = box("tkhd", bytesOf { o =>
      w32(o, 0x00000007L)                    // v0, enabled|in movie|preview
      w32(o, 0); w32(o, 0); w32(o, 1); w32(o, 0) // times, track 1
      w32(o, durMovie)
      w32(o, 0); w32(o, 0)                   // reserved
      w16(o, 0); w16(o, 0); w16(o, 0); w16(o, 0) // layer, group, volume, rsvd
      o.write(identity, 0, identity.length)
      w32(o, w.toLong << 16); w32(o, h.toLong << 16) // 16.16 fixed
    })
    val mdhd = box("mdhd", bytesOf { o =>
      w32(o, 0); w32(o, 0); w32(o, 0)
      w32(o, timescale); w32(o, durUnits)
      w16(o, 0x55C4); w16(o, 0)              // language 'und', pre_defined
    })
    val hdlr = box("hdlr", bytesOf { o =>
      w32(o, 0); w32(o, 0)
      "vide".foreach(c => o.write(c & 0xFF))
      w32(o, 0); w32(o, 0); w32(o, 0)
      o.write(0)                             // empty name
    })
    val vmhd = box("vmhd", bytesOf { o =>
      w32(o, 1)                              // v0, flags=1 (spec)
      w16(o, 0); w16(o, 0); w16(o, 0); w16(o, 0)
    })
    val dinf = box("dinf", box("dref", bytesOf { o =>
      w32(o, 0); w32(o, 1)                   // 1 entry: self-contained url
      w32(o, 12); "url ".foreach(c => o.write(c & 0xFF)); w32(o, 1)
    }))
    val stsd = box("stsd", bytesOf { o =>
      w32(o, 0); w32(o, 1)                   // entry_count
      w32(o, 86)                             // VisualSampleEntry size
      format.foreach(c => o.write(c & 0xFF))
      for (_ <- 0 until 6) o.write(0)        // reserved
      w16(o, 1)                              // data_reference_index
      for (_ <- 0 until 4) w32(o, 0)         // pre_defined/reserved (16)
      w16(o, w); w16(o, h)
      w32(o, 0x00480000L); w32(o, 0x00480000L) // 72 dpi
      w32(o, 0); w16(o, 1)                   // reserved, frame_count
      for (_ <- 0 until 32) o.write(0)       // compressorname
      w16(o, 24); w16(o, 0xFFFF)             // depth, pre_defined -1
    })
    // stts with real run-length encoding of equal consecutive deltas
    val runs = {
      val rs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      deltas.foreach { d =>
        if (rs.nonEmpty && rs.last._2 == d)
          rs(rs.length - 1) = (rs.last._1 + 1, d)
        else rs += ((1, d))
      }
      rs.toSeq
    }
    val stts = box("stts", bytesOf { o =>
      w32(o, 0); w32(o, runs.length)
      runs.foreach { case (cnt, d) => w32(o, cnt); w32(o, d) }
    })
    val stsc = box("stsc", bytesOf { o =>
      val rem = n % samplesPerChunk
      val fullChunks = n / samplesPerChunk
      w32(o, 0)
      if (n == 0) w32(o, 0)
      else if (rem == 0 || fullChunks == 0) {
        w32(o, 1); w32(o, 1); w32(o, if (rem == 0) samplesPerChunk else rem)
        w32(o, 1)
      } else {
        w32(o, 2)
        w32(o, 1); w32(o, samplesPerChunk); w32(o, 1)
        w32(o, fullChunks + 1); w32(o, rem); w32(o, 1)
      }
    })
    val stsz = box("stsz", bytesOf { o =>
      w32(o, 0); w32(o, 0); w32(o, n)        // per-sample table
      payloads.foreach(p => w32(o, p.length))
    })
    val stco = box("stco", bytesOf { o =>
      w32(o, 0); w32(o, chunkOffsets.length)
      chunkOffsets.foreach(off => w32(o, off))
    })
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  /** `'raw '`-codec MP4 with `bands.length` equal horizontal color
    * bands per frame (row y takes band `y*n/h`) — the closed-form
    * fixture shape shared with [[VideoCodec.encodeAviBands]], stored
    * top-down RGB (no padding, rowbytes = 3w). */
  def encodeMp4Bands(w: Int, h: Int, frames: Seq[Seq[Int]],
                     timescale: Int, deltas: Seq[Int],
                     samplesPerChunk: Int = 2): Array[Byte] = {
    val payloads: Seq[Array[Byte]] = frames.map { colors =>
      val d = new Array[Byte](3 * w * h)
      var y = 0
      while (y < h) {
        val rgb = colors(y * colors.length / h)
        val row = y * w * 3
        var x = 0
        while (x < w) {
          val p = row + x * 3
          d(p) = (rgb >> 16).toByte
          d(p + 1) = (rgb >> 8).toByte
          d(p + 2) = rgb.toByte
          x += 1
        }
        y += 1
      }
      d
    }
    encodeMp4(w, h, payloads, "raw ", timescale, deltas, samplesPerChunk)
  }

  /** MJPEG-in-MP4: each sample a complete JPEG from the shared
    * two-band fixture shape — exercises the same sample walk with the
    * lossy ImageIO decode path (spec tolerance, not oracle-hashed). */
  def encodeMp4Mjpeg(w: Int, h: Int, frameColors: Seq[(Int, Int)],
                     timescale: Int, deltas: Seq[Int]): Array[Byte] =
    encodeMp4(w, h,
      frameColors.map(c => ImageCodec.encodeJpeg(w, h, c._1, c._2)),
      "jpeg", timescale, deltas)
}
