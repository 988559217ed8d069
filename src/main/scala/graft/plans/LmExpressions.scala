package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpressionInfo, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native bit-cost bigram scoring (`graft_bigram_costs`): the
  * one-pass fused form of the character-bigram LM scorer
  * ([[graft.operators.TextAnalysis.lmScoreBits]]'s hot path).
  *
  * The composed pipeline it replaces — two `regexp_replace` passes, a
  * lookahead `regexp_extract_all` building one 2-char STRING per
  * bigram, `explode` (one ROW per bigram per document), a broadcast
  * join against the model, and a per-document re-aggregation — is
  * exactly the interpreted-HOF-and-explode shape `graft_del_hashes`
  * replaced in FuzzyJoin for a measured 2.3×
  * ([[FuzzyExpressions]] precedent; verdict r9 item 5). Here the whole
  * normalize → bigram → cost → sum chain runs per ROW inside
  * whole-stage codegen: the 38-symbol alphabet makes the model a
  * dense 1444-entry long[] lookup (broadcast to every task as a plan
  * reference object), so scoring allocates nothing, shuffles nothing,
  * and the per-document aggregate falls out of the scan.
  *
  * Semantics are BIT-IDENTICAL to the composed form, oracle-gated by
  * q_lm_quality / q_lm_quality_cross and spec-pinned against the
  * exploded path:
  *  - normalization: `lower(text)`, then `[\t\n\f\r]` → ' ', then
  *    anything outside `[a-z0-9 ]` → '_' (the fixed 38-symbol
  *    alphabet of [[graft.operators.TextAnalysis.lmNormalize]]);
  *  - bigrams: adjacent overlapping code-point pairs;
  *  - cost: `table(sym(a)*38 + sym(b))` summed in whole bits, with
  *    unseen bigrams pre-folded into the table by the caller;
  *  - output: struct(bits, n_bigrams); a doc with < 2 normalized
  *    code points scores (0, 0).
  *
  * The ASCII fast path walks raw UTF-8 bytes (one symbol per byte);
  * any non-ASCII byte routes the row through
  * [[UTF8String.toLowerCase]] — the SAME lowercasing `lower()` uses —
  * followed by a code-point walk, so multi-code-point case mappings
  * agree with the regex pipeline exactly.
  */
object LmOps {

  val Alphabet = 38 // a-z (26) + 0-9 (10) + ' ' + '_'

  /** Symbol index of an already-lowercased code point, after the
    * whitespace fold; -1 marks "not in the alphabet" (becomes '_'). */
  private def sym(cp: Int): Int = cp match {
    case c if c >= 'a' && c <= 'z' => c - 'a'
    case c if c >= '0' && c <= '9' => 26 + (c - '0')
    case ' ' | '\t' | '\n' | '\f' | '\r' => 36
    case _ => 37
  }

  /** Parse a 2-char normalized-alphabet bigram key (the `bigram`
    * column of a trained LM) into its dense table index. */
  def bigramIndex(bigram: String): Int = {
    require(bigram.length == 2,
      s"lm bigram key must be 2 chars, got '$bigram'")
    sym(bigram.charAt(0)) * Alphabet + sym(bigram.charAt(1))
  }

  /** Accumulate this document's bigram counts into a dense 1444-entry
    * accumulator — the training-side twin of [[bigramCosts]] (same
    * symbol walk, counts instead of cost lookups). Used by
    * [[graft.operators.TextAnalysis.trainBitCostLm]]'s per-partition
    * accumulation: one long[1444] per TASK, so training emits at most
    * 1444 rows per partition with no explode and no per-bigram string
    * allocation. */
  def accumulateBigrams(s: UTF8String, acc: Array[Long]): Unit = {
    var prev = -1
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) {
      i = 0
      while (i < bytes.length) {
        var c: Int = bytes(i)
        if (c >= 'A' && c <= 'Z') c += 32
        val cur = sym(c)
        if (prev >= 0) acc(prev * Alphabet + cur) += 1L
        prev = cur
        i += 1
      }
    } else {
      val lowered = s.toLowerCase.toString
      i = 0
      while (i < lowered.length) {
        val cp = lowered.codePointAt(i)
        val cur = sym(cp)
        if (prev >= 0) acc(prev * Alphabet + cur) += 1L
        prev = cur
        i += Character.charCount(cp)
      }
    }
  }

  /** Inverse of [[bigramIndex]]: the 2-char bigram key of a dense
    * table index (for emitting the trained model's `bigram` column). */
  def bigramKey(idx: Int): String = {
    val syms = "abcdefghijklmnopqrstuvwxyz0123456789 _"
    s"${syms.charAt(idx / Alphabet)}${syms.charAt(idx % Alphabet)}"
  }

  def bigramCosts(s: UTF8String, table: Array[Long]): InternalRow = {
    var bits = 0L
    var n = 0L
    var prev = -1
    val bytes = s.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) {
      i = 0
      while (i < bytes.length) {
        var c: Int = bytes(i)
        if (c >= 'A' && c <= 'Z') c += 32
        val cur = sym(c)
        if (prev >= 0) { bits += table(prev * Alphabet + cur); n += 1 }
        prev = cur
        i += 1
      }
    } else {
      // the SAME lowercasing lower() applies (incl. one-to-many case
      // mappings), then the per-code-point folds
      val lowered = s.toLowerCase.toString
      i = 0
      while (i < lowered.length) {
        val cp = lowered.codePointAt(i)
        val cur = sym(cp)
        if (prev >= 0) { bits += table(prev * Alphabet + cur); n += 1 }
        prev = cur
        i += Character.charCount(cp)
      }
    }
    InternalRow(bits, n)
  }
}

/** `graft_bigram_costs(text, costs)` — (bits, n_bigrams) of `text`
  * under a dense 1444-entry bigram cost table (costs must be a
  * foldable ARRAY<BIGINT> literal of length 38*38). The table is held
  * as an immutable IndexedSeq, NOT an Array: case-class equality over
  * an array is reference-based, which would defeat plan
  * canonicalization (subexpression elimination, exchange reuse)
  * whenever the cost table is rebuilt (ADVICE r10). */
case class BigramCostsExpr(child: Expression, table: IndexedSeq[Long])
    extends Expression {

  require(table.length == LmOps.Alphabet * LmOps.Alphabet,
    s"cost table must have ${LmOps.Alphabet * LmOps.Alphabet} entries")

  // the eval/codegen hot path reads a primitive array; derived once,
  // never part of equality
  @transient private lazy val tableArr: Array[Long] = table.toArray

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = child.nullable
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("bits", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false)))
  override def prettyName: String = "graft_bigram_costs"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else LmOps.bigramCosts(v.asInstanceOf[UTF8String], tableArr)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("lmCostTable", tableArr, "long[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        InternalRow ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.plans.LmOps.bigramCosts(
            ${c.value}, $tableRef);
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BigramCostsExpr =
    copy(child = newChildren.head)
}

object BigramCostsExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[BigramCostsExpr],
      "graft_bigram_costs")
}
