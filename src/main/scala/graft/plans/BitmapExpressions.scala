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
  * `offset = id mod 65536`), stored as up to 8 KiB of bytes with
  * trailing zero bytes trimmed — sparse buckets serialize small, and
  * byte-wise popcount makes the layout endian-free. The OLAP shape
  * this serves (ClickHouse `groupBitmap`/`bitmapAndCardinality`,
  * Druid/Pinot segment sketches) is exact distinct-set algebra whose
  * merge is an idempotent OR: duplicates vanish in the map-side
  * partial aggregate instead of riding the shuffle the way a
  * count-distinct Expand does. */
object BitmapCode {
  /** Ids per bucket (2^16 bits = 8 KiB dense). */
  val Width = 65536
  private val Words = Width / 64

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

  /** Little-endian bytes, trailing zero bytes trimmed. */
  def toBytes(buf: Array[Long]): Array[Byte] = {
    var lastWord = Words - 1
    while (lastWord >= 0 && buf(lastWord) == 0L) lastWord -= 1
    if (lastWord < 0) return Array.emptyByteArray
    var lastByte = (lastWord + 1) * 8 - 1
    val top = buf(lastWord)
    var shift = 56
    while (shift > 0 && (top >>> shift) == 0L) { shift -= 8; lastByte -= 1 }
    val out = new Array[Byte](lastByte + 1)
    var i = 0
    while (i <= lastByte) {
      out(i) = ((buf(i >>> 3) >>> ((i & 7) * 8)) & 0xff).toByte
      i += 1
    }
    out
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val buf = emptyBuffer()
    var i = 0
    while (i < bytes.length) {
      buf(i >>> 3) |= (bytes(i) & 0xffL) << ((i & 7) * 8)
      i += 1
    }
    buf
  }

  /** popcount(a AND b) — byte-wise over the common prefix, so two
    * trimmed bitmaps of different lengths compare correctly. */
  def andCount(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var c = 0L
    var i = 0
    while (i < n) { c += java.lang.Integer.bitCount((a(i) & b(i)) & 0xff); i += 1 }
    c
  }

  /** popcount(a) — the bucket's exact distinct count. */
  def count(a: Array[Byte]): Long = {
    var c = 0L
    var i = 0
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
