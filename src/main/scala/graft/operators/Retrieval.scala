package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** Ranked retrieval over a `documents(doc_id, text, ...)` corpus —
  * the "find training examples about X" query a data-curation team
  * runs constantly.
  *
  * Scale shape: one aggregate produces the tiny (N, avgdl, df per
  * term) statistics row, broadcast back across the corpus; term
  * frequencies and the score are scan projections; the top-k reduces
  * via TakeOrderedAndProject. The corpus is never shuffled — it is
  * scanned twice (stats pass, scoring pass), both passes pruned to
  * the text column; callers looping many term sets over one corpus
  * should persist the tokenized projection themselves.
  */
object Retrieval {

  private def native(fn: String, args: Column*): Column =
    GraftExtensions.nativeFn(fn, args: _*)

  /** Reference HOF form of the per-term frequency — kept as the spec
    * cross-check for the native `graft_token_count` expression. */
  private[graft] def tfHof(text: Column, term: String): Column =
    size(filter(split(text, " ", -1), x => x === lit(term))).cast("long")

  /** BM25 top-k (Robertson/Spärck Jones, Lucene's non-negative idf
    * form `ln(1 + (N - df + 0.5)/(df + 0.5))`) for a bag of query
    * terms over whitespace tokens.
    *
    * Determinism: tf/df/dl/N are exact integers, avgdl is an exact
    * long-sum ratio, and the score combines them with a fixed
    * left-to-right operator order — ties (identical tf vector and
    * dl) break on the id. Emitted scores are rounded to 6 dp so the
    * value survives cross-engine `ln` ulp differences. */
  def bm25TopK(df: DataFrame, idCol: String, text: Column,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val withTf = df
      .withColumn("__toks", TextAnalysis.tokenize(text))
      .select(col(idCol) +: size(col("__toks")).as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          // native one-pass byte scan; the HOF form ([[tfHof]]) paid
          // one interpreted lambda per token per term
          native("graft_token_count", text, lit(t)).as(s"tf_$i")
        }: _*)
    val statCols =
      count(lit(1)).as("n_docs") +: avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i"))
    val stats = withTf.agg(statCols.head, statCols.tail: _*)

    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
      idf * (tf * (k1 + 1)) /
        (tf + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)

    withTf.crossJoin(broadcast(stats))
      .withColumn("score", round(score, 6))
      .filter(col("score") > 0)
      .select(col(idCol), col("dl"), col("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) of
    * two ranked lists — the standard hybrid-retrieval merge (BM25 +
    * dense ANN) that needs no score calibration, only ranks:
    * `score(d) = Σ 1/(k + rank_i(d))`, absent lists contribute 0.
    *
    * Determinism: the score is carried as an exact integer fraction —
    * with `adj_i = k + rank_i` (1 when absent), `num = Σ_i present_j≠i
    * adj_j`, `den = Π adj_i` — so fusion never touches floats until
    * the final rounded display/order column, which any engine
    * reproduces bit-for-bit from the same integers.
    *
    * Scale: inputs are top-k lists (bounded rows); the full-outer
    * merge and sort are driver-trivial no matter the corpus behind
    * the lists. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
              rankCol: String = "rank", k: Int = 60,
              topK: Int = 20): DataFrame = {
    val fa = a.select(col(idCol), col(rankCol).as("__ra"))
    val fb = b.select(col(idCol), col(rankCol).as("__rb"))
    val adjA = coalesce(col("__ra") + k, lit(1L))
    val adjB = coalesce(col("__rb") + k, lit(1L))
    val indA = col("__ra").isNotNull.cast("long")
    val indB = col("__rb").isNotNull.cast("long")
    fa.join(fb, Seq(idCol), "full_outer")
      .withColumn("rrf",
        round((indA * adjB + indB * adjA).cast("double") / (adjA * adjB), 9))
      .withColumnRenamed("__ra", "rank_a")
      .withColumnRenamed("__rb", "rank_b")
      .orderBy(desc("rrf"), col(idCol))
      .limit(topK)
  }
}
