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

/** Byte-level Jaro–Winkler, bit-compatible with DuckDB's
  * `jaro_winkler_similarity` (validated pairwise on fixture names —
  * same match-window, transposition-halving, division ORDER, and the
  * THRESHOLD boost variant: the Winkler prefix bonus applies only when
  * jaro > 0.7, with the prefix capped at 4). Operating on UTF-8 BYTES
  * matches DuckDB's string model; ASCII inputs (the gated fixtures)
  * are byte == char anyway. */
object JaroOps {

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    if (a.equals(b)) return 1.0
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(i + md + 1, l2)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // EXACT double-op order of the validated reference:
    // ((m/l1 + m/l2) + (m−t)/m) / 3
    val jaro = (m.toDouble / l1 + m.toDouble / l2 +
      (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var l = 0
      val cap = math.min(4, math.min(l1, l2))
      while (l < cap && s1(l) == s2(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    }
  }
}

/** `graft_jaro_winkler(s1, s2)` — codegen'd scalar similarity for
  * blocked record-linkage scoring (pairs come from deletion-key or
  * sorted-neighborhood blocking; this never runs all-pairs). */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, STRING), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType =
    org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroOps.jaroWinkler(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.JaroOps.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[JaroWinklerExpr],
      "graft_jaro_winkler")
}
