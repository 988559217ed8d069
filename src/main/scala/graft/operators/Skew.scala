package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §4 / builder-prompt scale
  * rules). AQE's skew-join split handles most runtime skew; explicit
  * salting remains the tool when one join key dominates so heavily
  * that even split partitions hotspot, or when AQE is unavailable
  * (e.g. inside `foreachBatch`).
  *
  * Shape: the big side derives a deterministic salt in [0, n) from a
  * spreading column (any high-cardinality column — row content, not
  * `rand()`, so retries/speculative tasks stay consistent); the small
  * side replicates each row n times. The join key becomes
  * (key, salt) — the hot key's rows spread over n reducers.
  */
object Skew {

  /** Inner equi-join `big.key = small.key` with an n-way salt.
    * `spreadCol` is a big-side column whose hash spreads the hot key's
    * rows (must not be the join key itself). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 spreadCol: String, n: Int): DataFrame = {
    require(n > 0, "salt factor must be positive")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(spreadCol)), lit(n.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Skewed-key report: top-k join keys by row count with their share —
    * the diagnostic that decides between broadcast, salting, and AQE.
    * One scan: the total is a 1-row `agg(sum)` over the (already
    * aggregated, key-cardinality-sized) counts, broadcast-cross-joined
    * back — NOT an empty-partition-by window, which would drag the
    * whole key frame through ONE window partition (for a 10⁹-distinct-
    * key column the diagnostic would single-task exactly the disease
    * it diagnoses; r15 verdict #2). The two references to `counts`
    * share one shuffle via exchange reuse, so the input is still
    * scanned once.
    *
    * `partitions` > 0 adds `recommended_salt` per key: a key holding
    * share s of the rows lands s*P partitions' worth of data on ONE
    * reducer of a P-way shuffle, so ceil(s*P) salt buckets bring its
    * largest reducer back to ~the average partition load (clamped to
    * [1, P] — more than P buckets cannot spread further). Keys at or
    * under the average (s <= 1/P) recommend 1 = no salting. */
  def keySkewReport(df: DataFrame, key: String, topK: Int = 20,
                    partitions: Int = 0): DataFrame = {
    val counts = df.groupBy(key).agg(count(lit(1)).as("rows"))
    val total = counts.agg(sum("rows").as("__total"))
    val base = counts.crossJoin(broadcast(total))
      .withColumn("share", col("rows") / col("__total"))
      .drop("__total")
      .orderBy(desc("rows")).limit(topK)
    if (partitions <= 0) base
    else base.withColumn("recommended_salt",
      least(greatest(ceil(col("share") * partitions), lit(1L)),
        lit(partitions.toLong)).cast("int"))
  }

  /** [[saltedJoin]] with the salt factor DERIVED from the measured
    * skew: one key-cardinality-sized aggregation over the big side
    * (the [[keySkewReport]] math) picks n = ceil(max_share * P) for
    * the session's shuffle partition count P, and n == 1 (no dominant
    * key) falls back to the plain join — so callers wire the report
    * into the mitigation instead of hand-guessing a factor. The report
    * aggregation is map-side combined and tiny next to the join it
    * tunes.
    *
    * The measurement scan is eager (it runs at call time, inside a
    * transformation-shaped API) — at 100 TB don't pay it on the full
    * input: pass `sampleFraction` to measure on a Bernoulli sample
    * (share estimates concentrate fast — a hot key by definition has
    * plenty of rows in any sample), or skip the scan entirely by
    * passing a `precomputedSalt` from a cached [[keySkewReport]]. */
  def autoSaltedJoin(big: DataFrame, small: DataFrame, key: String,
                     spreadCol: String, sampleFraction: Double = 1.0,
                     precomputedSalt: Option[Int] = None): DataFrame = {
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val n = precomputedSalt.getOrElse {
      val p = big.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
      val measured =
        if (sampleFraction < 1.0) big.sample(sampleFraction, seed = 42L)
        else big
      val top = keySkewReport(measured, key, topK = 1, partitions = p)
        .select("recommended_salt").collect()
      if (top.isEmpty) 1 else top(0).getInt(0)
    }
    if (n <= 1) big.join(small, Seq(key))
    else saltedJoin(big, small, key, spreadCol, n)
  }

  /** Window operators with an EMPTY partition spec in `df`'s
    * optimized logical plan — `over ()` drags the ENTIRE input
    * through one window partition, the un-splittable-by-construction
    * failure class AQE cannot rescue (the r14–r16 skew audits found
    * five of these by hand; this makes the hunt mechanical). Returns
    * one string per offending Window node (its window expressions)
    * so pipelines can assert emptiness in CI: an empty result proves
    * no operator in the plan funnels the full frame into one task.
    * Works at the logical level (public, stable API) — value-KEYED
    * hot windows still need the semantic audit; this catches the
    * subset that is mechanically decidable. */
  def emptyPartitionWindows(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty =>
        w.windowExpressions.map(_.toString).mkString("; ")
    }
}
