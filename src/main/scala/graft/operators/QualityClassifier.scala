package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-n-gram LINEAR quality classifier — the fastText-style
  * (Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification") discriminative filter every large web-corpus
  * pipeline runs between heuristic scrubbing and LM-perplexity
  * bucketing: label a small reference set (wiki/books = good, raw
  * crawl = bad), train a linear model over HASHED n-gram features,
  * and score the whole corpus with one broadcast weight table.
  *
  * Design choices, all in service of determinism + the hash gate:
  *  - Features: DISTINCT word unigrams ∪ adjacent word bigrams of
  *    `lower(text)` split on `[^a-z0-9]+` (binarized presence — the
  *    NBSVM observation that binarized counts beat raw tf for short
  *    docs, and it makes the DuckDB oracle a plain `list_distinct`).
  *  - Hashing trick: feature → md5-high-32 mod `dim` (the repo's
  *    engine-portable hash, same family as the sampling coins), so
  *    the model is a DENSE long[dim] no matter how large the
  *    vocabulary — the property that keeps the broadcast table a few
  *    KB at 100 TB corpus scale. Collisions just merge weights
  *    (fastText ships the same trade).
  *  - Weights, INTEGER arithmetic end to end: for bucket b with
  *    cpos_b / cneg_b = number of positive / negative training docs
  *    containing a feature in b (with multiplicity under collisions),
  *    w_b = cpos_b·nNeg − cneg_b·nPos — the cross-multiplied
  *    class-rate difference (balance-invariant: a bucket scores
  *    positive iff its positive-class document RATE exceeds its
  *    negative-class rate). No floats, no log smoothing: every weight
  *    and score is a LONG the oracle replays bit-for-bit.
  *  - Score: Σ w_bucket(f) over the doc's feature set; predict
  *    positive iff score > 0.
  *
  * Scale shape: training is one explode + one map-side-combinable
  * groupBy on the ≤ dim hashed buckets (never a vocabulary-sized
  * shuffle); scoring is scan-level — the native
  * `graft_quality_score` expression carries the dense table as a
  * plan reference and fuses tokenize → hash → sum inside whole-stage
  * codegen (no explode, no join, no re-aggregation; the
  * [[graft.plans.LmExpressions]] precedent, measured there at 2.3×
  * over the composed form). */
object QualityClassifier {

  /** Distinct unigram ∪ adjacent-bigram feature set of `text` as an
    * array column — the composed form shared by training, the
    * composed scorer, and (structurally) the DuckDB oracle.
    *
    * `charN > 0` adds fastText's SUBWORD features (Bojanowski et al.
    * 2017, "Enriching Word Vectors with Subword Information"): the
    * char n-grams of each token wrapped in `<`…`>` boundary markers —
    * the robustness trick for the transliteration/obfuscation common
    * in web-corpus quality filtering, where "fr33 c4sino" shares no
    * WORD feature with its clean form but plenty of char grams.
    * Tokens are `[a-z0-9]+` (pure ASCII), so character indexing
    * agrees bit-for-bit across Spark, the JVM native twin, and
    * DuckDB. */
  def features(text: Column, charN: Int = 0): Column = {
    val toks = filter(split(lower(text), "[^a-z0-9]+", -1),
      t => t =!= lit(""))
    // zip_with pads the shorter side with NULL, so the last (token,
    // NULL) pair concats to NULL and is filtered — exactly the n-1
    // adjacent bigrams
    val bigrams = filter(
      zip_with(toks, slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)),
      x => x.isNotNull)
    val words = concat(toks, bigrams)
    if (charN == 0) array_distinct(words)
    else {
      val grams = flatten(transform(toks, { t =>
        val w = concat(lit("<"), t, lit(">"))
        // a token shorter than charN-2 has no full window; emit []
        // (flatten propagates a NULL element to a NULL result)
        when(length(w) >= charN,
          transform(sequence(lit(1), length(w) - lit(charN - 1)),
            i => w.substr(i, lit(charN))))
          .otherwise(array().cast("array<string>"))
      }))
      array_distinct(concat(words, grams))
    }
  }

  /** md5-high-32 bucket of a feature column: non-negative, < dim,
    * identical in Spark / JVM ([[graft.plans.ClassifierOps.bucket]]) /
    * DuckDB (`CAST(('0x' || substr(md5(f),1,8)) AS BIGINT) % dim`). */
  def bucket(feature: Column, dim: Int): Column =
    conv(substring(md5(feature.cast("binary")), 1, 8), 16, 10)
      .cast("long") % dim

  /** Train on a labeled frame: `label` must be +1 / −1 (anything else
    * fails loudly in-plan — a 0 or NULL label silently skewing the
    * class rates is the classic labeling bug). Returns the sparse
    * weight table (bucket LONG, w LONG), at most `dim` rows. */
  def train(labeled: DataFrame, text: Column, label: Column,
            dim: Int = 4096, charN: Int = 0): DataFrame = {
    require(dim > 0 && dim <= (1 << 22),
      s"dim must be in (0, 2^22]: $dim (the dense table broadcasts)")
    val y = when(label === 1 || label === -1, label.cast("long"))
      .otherwise(assert_true(label === 1 || label === -1,
        lit("QualityClassifier.train: label must be +1 or -1"))
        .cast("long"))
    val counts = labeled
      .select(y.as("__y"), explode(features(text, charN)).as("__f"))
      .select(col("__y"), bucket(col("__f"), dim).as("bucket"))
      .groupBy("bucket")
      .agg(sum(when(col("__y") === 1L, 1L).otherwise(0L)).as("__cpos"),
        sum(when(col("__y") === -1L, 1L).otherwise(0L)).as("__cneg"))
    val n = labeled.agg(
      sum(when(y === 1L, 1L).otherwise(0L)).as("__npos"),
      sum(when(y === -1L, 1L).otherwise(0L)).as("__nneg"))
    counts.crossJoin(broadcast(n))
      .select(col("bucket"),
        (col("__cpos") * col("__nneg") -
          col("__cneg") * col("__npos")).as("w"))
  }

  /** Score every document with the NATIVE one-pass expression: the
    * ≤ dim-row weight table collapses to a dense long[] plan
    * reference (bounded collect — the model IS broadcast-sized by
    * construction, the fastText contract). Output: (idCol, score
    * LONG, pred BOOLEAN). Docs with no tokens score 0; NULL text
    * scores 0 (the composed form's explode-drop + left-join
    * semantics). */
  def score(df: DataFrame, idCol: String, text: Column,
            weights: DataFrame, dim: Int = 4096,
            charN: Int = 0): DataFrame = {
    val table = new Array[Long](dim)
    weights.select("bucket", "w").collect().foreach { r =>
      val b = r.getLong(0)
      require(b >= 0 && b < dim, s"bucket $b out of range [0, $dim)")
      table(b.toInt) = r.getLong(1)
    }
    df.select(col(idCol),
        coalesce(graft.plans.GraftExtensions.nativeFn(
          "graft_quality_score", text, lit(table), lit(charN)),
          lit(0L)).as("score"))
      .withColumn("pred", col("score") > 0)
  }

  /** The composed (explode + broadcast-join + re-aggregate) scorer
    * the native expression replaced — the independent implementation
    * QualityClassifierSpec certifies [[score]] against. */
  def scoreComposed(df: DataFrame, idCol: String, text: Column,
                    weights: DataFrame, dim: Int = 4096,
                    charN: Int = 0): DataFrame =
    df.select(col(idCol), explode_outer(features(text, charN)).as("__f"))
      .withColumn("__b",
        when(col("__f").isNotNull, bucket(col("__f"), dim)))
      .join(broadcast(weights.select(col("bucket").as("__b"), col("w"))),
        Seq("__b"), "left")
      .groupBy(idCol)
      .agg(sum(when(col("__f").isNull, 0L)
        .otherwise(coalesce(col("w"), lit(0L)))).as("score"))
      .withColumn("pred", col("score") > 0)
}
