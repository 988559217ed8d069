package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hashed-n-gram linear scoring (`graft_quality_score`): the
  * one-pass fused scorer of the fastText-style quality classifier
  * ([[graft.operators.QualityClassifier]]).
  *
  * The composed pipeline it replaces — `split` + two array HOFs
  * building the distinct unigram∪bigram feature set, `explode` (one
  * ROW per feature per document), an md5 bucket hash, a broadcast
  * join against the weight table, and a per-document re-aggregation —
  * is the same interpreted-HOF-and-explode shape `graft_bigram_costs`
  * replaced for the bigram LM ([[LmExpressions]] precedent). Here the
  * whole tokenize → feature → hash → weight-sum chain runs per ROW
  * inside whole-stage codegen: the weight table is a dense long[]
  * carried as a plan reference object (the hashing trick bounds it at
  * `dim` entries regardless of vocabulary — the property that makes
  * fastText-style classifiers broadcastable at 100 TB), so scoring
  * shuffles nothing and the per-document score falls out of the scan.
  *
  * Semantics are BIT-IDENTICAL to the composed form and to the DuckDB
  * oracle (q_quality_classifier), spec-pinned in QualityClassifierSpec:
  *  - tokens: `lower(text)` split on `[^a-z0-9]+`, empties dropped
  *    (the SAME UTF8String.toLowerCase `lower()` uses, then the same
  *    Java regex `split` applies);
  *  - features: DISTINCT word unigrams ∪ adjacent word bigrams
  *    (joined with one space — a character no token contains);
  *  - bucket: first 8 hex chars of md5(feature) as an unsigned int,
  *    mod `dim` (non-negative by construction — the repo's standard
  *    engine-portable hash, shared with the sampling coins);
  *  - score: Σ table(bucket) over the feature set, in exact LONG
  *    arithmetic; a doc with no tokens scores 0; NULL text is NULL.
  */
object ClassifierOps {

  /** md5-high-32 bucket of a feature string — the JVM twin of
    * `conv(substr(md5(f), 1, 8), 16, 10) % dim` (Spark) and
    * `CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % dim` (DuckDB). */
  def bucket(feature: String, dim: Int): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest(feature.getBytes(StandardCharsets.UTF_8))
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (h % dim).toInt
  }

  /** Feature-set score: distinct word unigrams ∪ adjacent bigrams,
    * plus — when `charN > 0` — fastText's SUBWORD trick (Bojanowski
    * et al. 2017): the char n-grams of each token wrapped in boundary
    * markers `<`…`>`, so "fishing" contributes `<fi`, `fis`, …,
    * `ng>` and a transliterated/obfuscated variant still shares most
    * of its features with the clean form. Tokens are `[a-z0-9]+` by
    * construction (pure ASCII), so char/codepoint/byte indexing agree
    * across Spark, this JVM twin, and the DuckDB oracle. Tokens
    * shorter than `charN - 2` contribute no grams (the marked form
    * is shorter than one window). */
  def hashNgramScore(s: UTF8String, table: Array[Long],
                     charN: Int): Long = {
    val toks = s.toLowerCase.toString
      .split("[^a-z0-9]+", -1).filter(_.nonEmpty)
    val feats = new java.util.HashSet[String](
      math.max(16, toks.length * 3))
    var i = 0
    while (i < toks.length) {
      feats.add(toks(i))
      if (i + 1 < toks.length) feats.add(toks(i) + " " + toks(i + 1))
      if (charN > 0) {
        val w = "<" + toks(i) + ">"
        var j = 0
        while (j <= w.length - charN) {
          feats.add(w.substring(j, j + charN))
          j += 1
        }
      }
      i += 1
    }
    var score = 0L
    val it = feats.iterator()
    while (it.hasNext) score += table(bucket(it.next(), table.length))
    score
  }
}

/** `graft_quality_score(text, weights[, char_n])` — the hashed-n-gram
  * linear score of `text` under a dense `dim`-entry weight table
  * (weights must be a foldable ARRAY<BIGINT> literal). `char_n > 0`
  * adds the boundary-marked char n-gram subword features
  * ([[ClassifierOps.hashNgramScore]]). Immutable IndexedSeq
  * (not Array) for the same plan-canonicalization reason as
  * [[BigramCostsExpr]]: rebuilt-but-equal tables must compare equal. */
case class HashNgramScoreExpr(child: Expression, table: IndexedSeq[Long],
                              charN: Int = 0)
    extends Expression {

  require(table.nonEmpty, "weight table must be non-empty")
  require(charN >= 0, s"char_n must be >= 0: $charN")

  @transient private lazy val tableArr: Array[Long] = table.toArray

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = child.nullable
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_quality_score"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else ClassifierOps.hashNgramScore(v.asInstanceOf[UTF8String],
      tableArr, charN)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("qualityWeights", tableArr, "long[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
        ${c.code}
        boolean ${ev.isNull} = ${c.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.plans.ClassifierOps.hashNgramScore(
            ${c.value}, $tableRef, $charN);
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HashNgramScoreExpr =
    copy(child = newChildren.head)
}

object HashNgramScoreExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[HashNgramScoreExpr],
      "graft_quality_score")
}
