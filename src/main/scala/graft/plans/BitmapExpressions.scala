package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Fixed-width bitset kernels shared by the bitmap aggregate and the
  * popcount expressions. A bitmap covers one 65,536-id BUCKET of the
  * key space (the caller splits `id` into `bucket = id div 65536`,
  * `offset = id mod 65536`). The in-memory aggregation buffer is
  * always the dense 8 KiB word array (O(1) set/OR); the WIRE format —
  * both the shuffle serialization of partial buffers and the emitted
  * blob — is ADAPTIVE, the roaring-bitmap container rule (Chambi et
  * al. 2016): a bucket with ≤ 4095 set bits encodes as sorted u16
  * offsets (`1 + 2n` bytes), denser buckets as the trimmed
  * little-endian bitset (`1 + ⌈maxOff/8⌉` bytes); 4096 is exactly the
  * break-even where `2n` meets the 8 KiB dense payload. A one-byte
  * tag (1 = sparse, 0 = dense) disambiguates; the empty set is zero
  * bytes. At a sparse 10¹⁰-id space this is the difference between
  * 8 KiB and ~tens of bytes per (segment, bucket) row — mostly-empty
  * buckets no longer pay the dense frame.
  *
  * Wire-format versioning (ADVICE r12): the tagged layout is NOT
  * self-versioned against the pre-r12 untagged dense blob — an old
  * blob whose first byte happens to be 0x01 would decode as sparse
  * garbage. That is acceptable ONLY because these bytes are
  * shuffle-transient by contract: blobs live inside one query's
  * partial-aggregate exchange and are reduced to integer counts
  * before any sink; nothing persists them and no gate hash-compares
  * blob bytes across versions. If a future operator ever WRITES
  * bitmap blobs (a segment-sketch table, say), it must add a real
  * format-version header first — do not reuse this wire form as a
  * storage form.
  *
  * The OLAP shape this serves (ClickHouse
  * `groupBitmap`/`bitmapAndCardinality`, Druid/Pinot segment sketches)
  * is exact distinct-set algebra whose merge is an idempotent OR:
  * duplicates vanish in the map-side partial aggregate instead of
  * riding the shuffle the way a count-distinct Expand does. */
object BitmapCode {
  /** Ids per bucket (2^16 bits = 8 KiB dense). */
  val Width = 65536
  private val Words = Width / 64

  /** Largest popcount encoded as sorted shorts — the roaring
    * break-even: 4096 values × 2 bytes = the 8 KiB dense payload. */
  val SparseMax = 4095

  def emptyBuffer(): Array[Long] = new Array[Long](Words)

  def set(buf: Array[Long], offset: Int): Unit = {
    if (offset < 0 || offset >= Width)
      throw new IllegalArgumentException(
        s"graft_bitmap_agg offset $offset outside [0, $Width) — pass " +
          "pmod(id, 65536) and carry id div 65536 as the bucket column")
    buf(offset >>> 6) |= 1L << (offset & 63)
  }

  def or(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Words) { a(i) |= b(i); i += 1 }
    a
  }

  /** Adaptive encode: empty → 0 bytes; popcount ≤ [[SparseMax]] →
    * tag 1 + ascending little-endian u16 offsets; else tag 0 +
    * little-endian bitset bytes, trailing zero bytes trimmed. */
  def toBytes(buf: Array[Long]): Array[Byte] = {
    var n = 0
    var w = 0
    while (w < Words) { n += java.lang.Long.bitCount(buf(w)); w += 1 }
    if (n == 0) return Array.emptyByteArray
    if (n <= SparseMax) {
      val out = new Array[Byte](1 + 2 * n)
      out(0) = 1
      var k = 1
      w = 0
      while (w < Words) {
        var bits = buf(w)
        while (bits != 0L) {
          val off = w * 64 + java.lang.Long.numberOfTrailingZeros(bits)
          out(k) = (off & 0xff).toByte
          out(k + 1) = ((off >>> 8) & 0xff).toByte
          k += 2
          bits &= bits - 1
        }
        w += 1
      }
      out
    } else {
      var lastWord = Words - 1
      while (buf(lastWord) == 0L) lastWord -= 1
      var lastByte = (lastWord + 1) * 8 - 1
      val top = buf(lastWord)
      var shift = 56
      while (shift > 0 && (top >>> shift) == 0L) { shift -= 8; lastByte -= 1 }
      val out = new Array[Byte](2 + lastByte)
      out(0) = 0
      var i = 0
      while (i <= lastByte) {
        out(i + 1) = ((buf(i >>> 3) >>> ((i & 7) * 8)) & 0xff).toByte
        i += 1
      }
      out
    }
  }

  /** Decode a wire blob into a fresh dense buffer. ONE decoder exists
    * for the tagged wire format — this is [[orBytes]] into an empty
    * buffer (ADVICE r13: two verbatim decode loops could drift if the
    * format ever changes; OR-into-empty IS decode). */
  def fromBytes(bytes: Array[Byte]): Array[Long] =
    orBytes(emptyBuffer(), bytes)

  /** OR a WIRE blob into a dense aggregation buffer — the update path
    * of `graft_bitmap_or_agg` (bitmap-of-bitmaps merge: re-windowing a
    * per-period bitmap frame unions blobs, never re-touching raw
    * events). Sparse blobs set their offsets; dense blobs OR byte-wise
    * into the words. */
  def orBytes(buf: Array[Long], blob: Array[Byte]): Array[Long] = {
    if (blob.length == 0) return buf
    if (blob(0) == 1) {
      var k = 1
      while (k + 1 < blob.length) {
        val off = (blob(k) & 0xff) | ((blob(k + 1) & 0xff) << 8)
        buf(off >>> 6) |= 1L << (off & 63)
        k += 2
      }
    } else {
      var i = 1
      while (i < blob.length) {
        buf((i - 1) >>> 3) |= (blob(i) & 0xffL) << (((i - 1) & 7) * 8)
        i += 1
      }
    }
    buf
  }

  /** Bit test inside a DENSE payload (bytes after the tag). */
  private def denseHas(a: Array[Byte], off: Int): Boolean = {
    val byteIdx = 1 + (off >>> 3)
    byteIdx < a.length && ((a(byteIdx) >> (off & 7)) & 1) != 0
  }

  private def sparseShort(a: Array[Byte], slot: Int): Int =
    (a(1 + 2 * slot) & 0xff) | ((a(2 + 2 * slot) & 0xff) << 8)

  /** popcount(a AND b) — dispatches on the tag pair: dense×dense is a
    * byte-wise AND-popcount over the common payload prefix,
    * sparse×sparse a two-pointer merge over the sorted offsets,
    * sparse×dense per-offset bit tests. */
  def andCount(a: Array[Byte], b: Array[Byte]): Long = {
    if (a.length == 0 || b.length == 0) return 0L
    val sa = a(0) == 1
    val sb = b(0) == 1
    if (sa && sb) {
      val na = (a.length - 1) / 2
      val nb = (b.length - 1) / 2
      var i = 0; var j = 0; var c = 0L
      while (i < na && j < nb) {
        val va = sparseShort(a, i)
        val vb = sparseShort(b, j)
        if (va == vb) { c += 1; i += 1; j += 1 }
        else if (va < vb) i += 1
        else j += 1
      }
      c
    } else if (sa || sb) {
      val sp = if (sa) a else b
      val dn = if (sa) b else a
      val n = (sp.length - 1) / 2
      var i = 0; var c = 0L
      while (i < n) {
        if (denseHas(dn, sparseShort(sp, i))) c += 1
        i += 1
      }
      c
    } else {
      val n = math.min(a.length, b.length)
      var c = 0L
      var i = 1
      while (i < n) {
        c += java.lang.Integer.bitCount((a(i) & b(i)) & 0xff); i += 1
      }
      c
    }
  }

  /** popcount(a) — the bucket's exact distinct count: O(1) for sparse
    * blobs (the length IS the count), byte-wise popcount for dense. */
  def count(a: Array[Byte]): Long = {
    if (a.length == 0) return 0L
    if (a(0) == 1) return ((a.length - 1) / 2).toLong
    var c = 0L
    var i = 1
    while (i < a.length) { c += java.lang.Integer.bitCount(a(i) & 0xff); i += 1 }
    c
  }
}

/** `graft_bitmap_agg(offset)` — exact distinct-set aggregate: ORs the
  * bucket-local bit for each input offset into an 8 KiB bitset,
  * emitted as trimmed bytes. The partial/merge path is the same OR
  * (TypedImperativeAggregate), so duplicate ids are eliminated
  * map-side and a shuffle row is one (group, ≤8 KiB) blob no matter
  * how many input rows fed it — the scale contrast with
  * `count(DISTINCT x)`'s per-row Expand. */
case class BitmapAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects INT offsets in [0, ${BitmapCode.Width}), got " +
        child.dataType.simpleString)

  override def createAggregationBuffer(): Array[Long] = BitmapCode.emptyBuffer()

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) BitmapCode.set(buf, v.asInstanceOf[Int])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    BitmapCode.or(a, b)

  override def eval(buf: Array[Long]): Any = BitmapCode.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BitmapCode.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BitmapCode.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BitmapAggExpr = copy(child = newChild)
}

object BitmapAggExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[BitmapAggExpr], "graft_bitmap_agg")
}

/** `graft_bitmap_or_agg(blob)` — exact UNION of bitmap blobs: the
  * second-level aggregate that makes bitmap frames COMPOSABLE.
  * `graft_bitmap_agg` folds raw offsets into per-group blobs once;
  * this aggregate then unions those blobs under any coarser or
  * re-windowed grouping (rolling windows, segment unions, day →
  * month rollups) without ever re-touching the raw rows — the
  * OR-of-ORs is the same idempotent merge, so duplicates still die
  * map-side and a shuffle row stays one (group, ≤8 KiB) blob. */
case class BitmapOrAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY bitmap blobs, got " +
        child.dataType.simpleString)

  override def createAggregationBuffer(): Array[Long] = BitmapCode.emptyBuffer()

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) BitmapCode.orBytes(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    BitmapCode.or(a, b)

  override def eval(buf: Array[Long]): Any = BitmapCode.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BitmapCode.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BitmapCode.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_or_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapOrAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapOrAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): BitmapOrAggExpr = copy(child = newChild)
}

object BitmapOrAggExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[BitmapOrAggExpr],
      "graft_bitmap_or_agg")
}

/** `graft_bitmap_and_count(a, b)` — exact |A ∩ B| of two bitmap blobs
  * (codegen'd byte-wise popcount of the AND). */
case class BitmapAndCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY, BINARY), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_and_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapCode.andCount(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.BitmapCode.andCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCountExpr =
    copy(left = newLeft, right = newRight)
}

object BitmapAndCountExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[BitmapAndCountExpr],
      "graft_bitmap_and_count")
}

/** `graft_bitmap_count(a)` — exact |A| of one bitmap blob. */
case class BitmapCountExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_count"

  override protected def nullSafeEval(a: Any): Any =
    BitmapCode.count(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.BitmapCode.count($a)")

  override protected def withNewChildInternal(
      newChild: Expression): BitmapCountExpr = copy(child = newChild)
}

object BitmapCountExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[BitmapCountExpr],
      "graft_bitmap_count")
}
