package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Blocking-key generation for the edit-distance join, as a native
  * expression. The HOF form ([[graft.operators.FuzzyJoin.deletionKeysK]])
  * is the readable specification, but Spark evaluates higher-order
  * functions interpreted — at radius 2 a corpus row emits
  * O(len²/2) variant STRINGS through an interpreter loop, which
  * dominated the join's wall clock. This expression emits the
  * `xxhash64` values of the variants directly (seed 42 — identical to
  * Spark's `xxhash64(variant)`, so the join semantics are unchanged,
  * certified by the parity spec): for ASCII inputs the variants never
  * materialize, each hash is computed over a reused byte buffer with
  * one character-range elided; non-ASCII falls back to
  * codepoint-correct string building. Per-row duplicates are removed
  * (equal adjacent characters collapse variants) to keep the explode
  * minimal. */
object FuzzyOps {
  private val Seed = 42L

  private def hashBytes(buf: Array[Byte], len: Int): Long =
    XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, Seed)

  private def hashString(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, Seed)
  }

  /** xxhash64 of `s` with chars [i, j) and [p, q) removed (byte-level;
    * caller guarantees ASCII). Ranges must be disjoint and ordered. */
  private def hashAsciiMinus(bytes: Array[Byte], buf: Array[Byte],
                             i: Int, j: Int, p: Int, q: Int): Long = {
    var w = 0
    var r = 0
    while (r < bytes.length) {
      if ((r < i || r >= j) && (r < p || r >= q)) { buf(w) = bytes(r); w += 1 }
      r += 1
    }
    hashBytes(buf, w)
  }

  def delHashes(s: UTF8String, k: Int): ArrayData = {
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    if (s.numBytes == s.numChars) { // pure ASCII: byte == char
      val bytes = s.getBytes
      val n = bytes.length
      val buf = new Array[Byte](n)
      out.add(hashBytes(bytes, { System.arraycopy(bytes, 0, buf, 0, n); n }))
      var i = 0
      while (i < n) {
        out.add(hashAsciiMinus(bytes, buf, i, i + 1, n, n))
        if (k >= 2) {
          var j = i + 1
          while (j < n) {
            out.add(hashAsciiMinus(bytes, buf, i, i + 1, j, j + 1))
            j += 1
          }
        }
        i += 1
      }
    } else {
      val str = s.toString
      val cps = str.codePoints().toArray
      val n = cps.length
      def variant(skip1: Int, skip2: Int): String = {
        val sb = new java.lang.StringBuilder(str.length)
        var i = 0
        while (i < n) {
          if (i != skip1 && i != skip2) sb.appendCodePoint(cps(i))
          i += 1
        }
        sb.toString
      }
      out.add(hashString(str))
      var i = 0
      while (i < n) {
        out.add(hashString(variant(i, -1)))
        if (k >= 2) {
          var j = i + 1
          while (j < n) { out.add(hashString(variant(i, j))); j += 1 }
        }
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var w = 0
    while (it.hasNext) { arr(w) = it.next().longValue(); w += 1 }
    new GenericArrayData(arr)
  }
}

/** `graft_del_hashes(s, k)` — xxhash64 values of the depth-≤k deletion
  * neighborhood of `s` (k ∈ {1, 2} fixed at plan time). */
case class DeletionHashesExpr(child: Expression, k: Int)
    extends UnaryExpression {

  require(k == 1 || k == 2, s"supported radii: 1, 2 (got $k)")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_del_hashes"

  override protected def nullSafeEval(input: Any): Any =
    FuzzyOps.delHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.FuzzyOps.delHashes($c, $k)")

  override protected def withNewChildInternal(
      newChild: Expression): DeletionHashesExpr = copy(child = newChild)
}

object DeletionHashesExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[DeletionHashesExpr], "graft_del_hashes")
}
