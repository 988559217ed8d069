package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level media header parsing — PUBLIC container formats only,
  * parsed from their published layouts (no codec libraries):
  *
  *  - PNG: 8-byte signature, then the IHDR chunk — width/height as
  *    big-endian u32 at offsets 16/20, bit depth at 24, color type at
  *    25 (channel count follows the PNG spec's color-type table).
  *  - JPEG/JFIF: FF D8 marker stream; segments are skipped by their
  *    big-endian length until a start-of-frame marker (C0-C3, C5-C7,
  *    C9-CB, CD-CF — C4/C8/CC are tables, not frames), which carries
  *    precision(1), height(2), width(2), component count(1).
  *  - GIF: "GIF87a"/"GIF89a", then logical-screen width/height as
  *    little-endian u16 at offsets 6/8.
  *  - WAV: "RIFF" + "WAVE", then a chunk scan (id(4) + size LE u32,
  *    word-aligned) for "fmt ": channels at +10 (LE u16), sample rate
  *    at +12 (LE u32), bits per sample at +22 (LE u16).
  *  - MP4 (ISO-BMFF): size(4 BE)+type(4) box walk — `ftyp` first, then
  *    top-level boxes to `moov`; inside it `mvhd` carries timescale +
  *    duration (v0: u32s at +20/+24 from box start; v1: u32 at +28,
  *    u64 at +32) and the first `trak`'s `tkhd` carries width/height
  *    as 16.16 fixed-point u32s (v0: +84/+88; v1: +96/+100). Duration
  *    is surfaced as milliseconds: duration*1000/timescale.
  *
  * Unrecognized, truncated, or malformed payloads parse to NULL — the
  * expression never throws on bad bytes (corrupt media is data, not an
  * error, at corpus scale).
  */
object MediaOps {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  private def be64(b: Array[Byte], i: Int): Long =
    ((be32(b, i) & 0xFFFFFFFFL) << 32) | (be32(b, i + 4) & 0xFFFFFFFFL)

  private def row(format: String, width: Any, height: Any,
                  sampleRate: Any, channels: Any, bitDepth: Any,
                  durationMs: Any = null): InternalRow =
    InternalRow(UTF8String.fromString(format), width, height, sampleRate,
      channels, bitDepth, durationMs)

  private val pngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** (format, width, height, sample_rate, channels, bit_depth) or null. */
  def parseHeader(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 12) return null
    try {
      if (b.startsWith(pngSig)) parsePng(b)
      else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) parseJpeg(b)
      else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
               (b(4) == '7' || b(4) == '9') && b(5) == 'a') parseGif(b)
      else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
               b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')
        parseWav(b)
      else if (b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p')
        parseMp4(b)
      else null
    } catch { // any structural surprise (truncation mid-field) -> null
      case _: IndexOutOfBoundsException => null
    }
  }

  private def parsePng(b: Array[Byte]): InternalRow = {
    // IHDR must be the first chunk: length(4) "IHDR"(4) data(13) crc(4)
    if (b.length < 26 || be32(b, 8) != 13 ||
        b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R')
      return null
    val colorType = b(25) & 0xFF
    val channels = colorType match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 3 => 1 // indexed
      case 4 => 2 // grey + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return null
    }
    row("png", be32(b, 16), be32(b, 20), null, channels, b(24) & 0xFF)
  }

  private def parseJpeg(b: Array[Byte]): InternalRow = {
    var pos = 2
    while (pos + 1 < b.length) {
      if ((b(pos) & 0xFF) != 0xFF) return null
      // the spec permits 0xFF fill/padding bytes before a marker —
      // skip the run so a padding byte is not misread as marker 0xFF
      var mk = pos + 1
      while (mk < b.length && (b(mk) & 0xFF) == 0xFF) mk += 1
      if (mk >= b.length) return null
      val marker = b(mk) & 0xFF
      if (marker == 0xD8 || marker == 0x01 ||
          (marker >= 0xD0 && marker <= 0xD7)) pos = mk + 1 // standalone
      else if (marker == 0xD9) return null                 // EOI before SOF
      else {
        if (mk + 2 >= b.length) return null
        val len = be16(b, mk + 1)
        if (len < 2) return null
        val isSof = (marker >= 0xC0 && marker <= 0xCF) &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (mk + 8 >= b.length) return null
          return row("jpeg", be16(b, mk + 6), be16(b, mk + 4), null,
            b(mk + 8) & 0xFF, b(mk + 3) & 0xFF)
        }
        pos = mk + 1 + len
      }
    }
    null
  }

  private def parseGif(b: Array[Byte]): InternalRow =
    if (b.length < 10) null
    else row("gif", le16(b, 6), le16(b, 8), null, null, null)

  private def parseWav(b: Array[Byte]): InternalRow = {
    var off = 12
    while (off + 8 <= b.length) {
      val size = le32(b, off + 4)
      if (size < 0) return null
      if (b(off) == 'f' && b(off + 1) == 'm' && b(off + 2) == 't' &&
          b(off + 3) == ' ') {
        if (size < 16 || off + 8 + 16 > b.length) return null
        return row("wav", null, null, le32(b, off + 12), le16(b, off + 10),
          le16(b, off + 22))
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    null
  }

  /** ISO-BMFF box walk. Returns the next box's (payload-relative)
    * start and end, or null bounds via -1 when malformed. A box is
    * size(4 BE) + type(4); size==0 means to-EOF, size==1 (64-bit
    * largesize) is accepted when it fits an Int. */
  private def boxEnd(b: Array[Byte], off: Int, limit: Int): Int = {
    if (off + 8 > limit) return -1
    val size = be32(b, off)
    if (size == 0) limit
    else if (size == 1) {
      if (off + 16 > limit) return -1
      val big = be64(b, off + 8)
      if (big < 16 || big > (limit - off).toLong) -1 else off + big.toInt
    }
    else if (size < 8 || off + size > limit) -1
    else off + size
  }

  private def boxIs(b: Array[Byte], off: Int, t: String): Boolean =
    b(off + 4) == t.charAt(0) && b(off + 5) == t.charAt(1) &&
      b(off + 6) == t.charAt(2) && b(off + 7) == t.charAt(3)

  private def parseMp4(b: Array[Byte]): InternalRow = {
    // top-level walk to moov
    var off = 0
    var moovStart = -1
    var moovEnd = -1
    while (off < b.length && moovStart < 0) {
      val end = boxEnd(b, off, b.length)
      if (end <= off) return null
      if (boxIs(b, off, "moov")) { moovStart = off; moovEnd = end }
      off = end
    }
    if (moovStart < 0) return null
    var timescale = 0L
    var duration = -1L
    var width: Any = null
    var height: Any = null
    // moov children: mvhd (timescale/duration), first trak's tkhd (dims)
    var c = moovStart + 8
    while (c < moovEnd) {
      val end = boxEnd(b, c, moovEnd)
      if (end <= c) return null
      if (boxIs(b, c, "mvhd") && end - c >= 12) {
        val v = b(c + 8) & 0xFF
        if (v == 0 && end - c >= 28) {
          timescale = be32(b, c + 20) & 0xFFFFFFFFL
          duration = be32(b, c + 24) & 0xFFFFFFFFL
        } else if (v == 1 && end - c >= 40) {
          timescale = be32(b, c + 28) & 0xFFFFFFFFL
          duration = be64(b, c + 32)
        }
      } else if (boxIs(b, c, "trak") && width == null) {
        var t = c + 8
        while (t < end && width == null) {
          val tend = boxEnd(b, t, end)
          if (tend <= t) return null
          if (boxIs(b, t, "tkhd") && tend - t >= 12) {
            val v = b(t + 8) & 0xFF
            val wOff = if (v == 1) t + 96 else t + 84
            if (tend - t >= (wOff - t) + 8) {
              val w = be32(b, wOff) >>> 16 // 16.16 fixed point
              val h = be32(b, wOff + 4) >>> 16
              if (w > 0 && h > 0) { width = w; height = h }
            }
          }
          t = tend
        }
      }
      c = end
    }
    val durMs: Any =
      if (timescale > 0 && duration >= 0) {
        val ms = duration * 1000L / timescale
        if (ms <= Int.MaxValue) ms.toInt else null
      } else null
    row("mp4", width, height, null, null, null, durMs)
  }

  /** Defensive ceiling on the decoded timeline: an hour of 30 fps video
    * is ~108k samples; anything claiming more than this in a header is
    * treated as malformed rather than allocated. */
  val MaxTimelineSamples = 1 << 20

  /** REAL per-frame presentation times from the MP4 sample table:
    * walk moov -> trak -> mdia -> { mdhd (media timescale), minf ->
    * stbl -> stts } and expand the (sample_count, sample_delta) runs
    * into cumulative start times, converted to milliseconds with the
    * MEDIA timescale (stts deltas are in mdhd units, not mvhd units).
    * Null for non-MP4 bytes, missing boxes, or malformed tables —
    * never throws. */
  def mp4SampleTimesMs(b: Array[Byte]): Array[Int] = {
    if (b == null || b.length < 12 ||
        !(b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'))
      return null
    try {
      var off = 0
      var moovS = -1; var moovE = -1
      while (off < b.length && moovS < 0) {
        val end = boxEnd(b, off, b.length)
        if (end <= off) return null
        if (boxIs(b, off, "moov")) { moovS = off; moovE = end }
        off = end
      }
      if (moovS < 0) return null
      // first trak only (same policy as parseMp4's dimensions)
      var trakS = -1; var trakE = -1
      var c = moovS + 8
      while (c < moovE && trakS < 0) {
        val end = boxEnd(b, c, moovE)
        if (end <= c) return null
        if (boxIs(b, c, "trak")) { trakS = c; trakE = end }
        c = end
      }
      if (trakS < 0) return null
      var mdiaS = -1; var mdiaE = -1
      c = trakS + 8
      while (c < trakE && mdiaS < 0) {
        val end = boxEnd(b, c, trakE)
        if (end <= c) return null
        if (boxIs(b, c, "mdia")) { mdiaS = c; mdiaE = end }
        c = end
      }
      if (mdiaS < 0) return null
      var timescale = 0L
      var sttsOff = -1; var sttsEnd = -1
      c = mdiaS + 8
      while (c < mdiaE) {
        val end = boxEnd(b, c, mdiaE)
        if (end <= c) return null
        if (boxIs(b, c, "mdhd") && end - c >= 24) {
          val v = b(c + 8) & 0xFF
          timescale =
            if (v == 1 && end - c >= 32) be32(b, c + 28) & 0xFFFFFFFFL
            else be32(b, c + 20) & 0xFFFFFFFFL
        } else if (boxIs(b, c, "minf")) {
          var m = c + 8
          while (m < end) {
            val mend = boxEnd(b, m, end)
            if (mend <= m) return null
            if (boxIs(b, m, "stbl")) {
              var s = m + 8
              while (s < mend) {
                val send = boxEnd(b, s, mend)
                if (send <= s) return null
                if (boxIs(b, s, "stts")) { sttsOff = s; sttsEnd = send }
                s = send
              }
            }
            m = mend
          }
        }
        c = end
      }
      if (timescale <= 0 || sttsOff < 0 || sttsEnd - sttsOff < 16) return null
      val entryCount = be32(b, sttsOff + 12)
      if (entryCount < 0 || sttsOff + 16 + entryCount * 8L > sttsEnd)
        return null
      var total = 0L
      var e = 0
      while (e < entryCount) {
        val n = be32(b, sttsOff + 16 + e * 8) & 0xFFFFFFFFL
        total += n
        if (total > MaxTimelineSamples) return null
        e += 1
      }
      val times = new Array[Int](total.toInt)
      var t = 0L
      var idx = 0
      e = 0
      while (e < entryCount) {
        val n = be32(b, sttsOff + 16 + e * 8)
        val delta = be32(b, sttsOff + 20 + e * 8) & 0xFFFFFFFFL
        var i = 0
        while (i < n) {
          val ms = t * 1000L / timescale
          if (ms > Int.MaxValue) return null
          times(idx) = ms.toInt
          idx += 1
          t += delta
          i += 1
        }
        e += 1
      }
      times
    } catch { case _: IndexOutOfBoundsException => null }
  }
}

/** `graft_media_meta(bytes)` — media container metadata parsed from the
  * public header layouts ([[MediaOps.parseHeader]]) as a codegen'd
  * struct projection; NULL for unrecognized/corrupt payloads. */
case class MediaMetaExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${other.sql}")
  }

  override def dataType: DataType = MediaMetaExpr.schema
  // null on unrecognized bytes regardless of child nullability
  override def nullable: Boolean = true
  override def prettyName: String = "graft_media_meta"

  override protected def nullSafeEval(v: Any): Any =
    MediaOps.parseHeader(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("mediaMeta")
      s"""
        org.apache.spark.sql.catalyst.InternalRow $res =
          graft.plans.MediaOps.parseHeader($c);
        if ($res == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $res; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression)
      : MediaMetaExpr = copy(child = newChild)
}

/** `graft_mp4_timeline(bytes)` — per-frame presentation times (ms)
  * decoded from the MP4 sample table ([[MediaOps.mp4SampleTimesMs]]);
  * NULL for non-MP4 or malformed payloads. */
case class Mp4TimelineExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp4_timeline"

  override protected def nullSafeEval(v: Any): Any = {
    val times = MediaOps.mp4SampleTimesMs(v.asInstanceOf[Array[Byte]])
    if (times == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(times)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("mp4Times")
      s"""
        int[] $res = graft.plans.MediaOps.mp4SampleTimesMs($c);
        if ($res == null) { ${ev.isNull} = true; }
        else { ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData($res); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Mp4TimelineExpr = copy(child = newChild)
}

object Mp4TimelineExpr {
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[Mp4TimelineExpr].getName, "graft_mp4_timeline")
}

object MediaMetaExpr {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bit_depth", IntegerType),
    StructField("duration_ms", IntegerType)))

  val info: ExpressionInfo =
    new ExpressionInfo(classOf[MediaMetaExpr].getName, "graft_media_meta")
}
