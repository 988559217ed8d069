package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample distribution-drift screens in EXACT integer
  * arithmetic — the corpus-monitoring step of a training-data
  * pipeline (did this crawl snapshot / source mix shift against the
  * last one?). Classical drift statistics (KS, chi-squared) are
  * float-valued; both screens here keep the DECISION quantities as
  * exact cross-multiplied integers so a distributed run is
  * hash-certifiable against a SQL oracle, and only derive the
  * conventional float statistic from those integers at the end (one
  * division of exact longs — bit-identical across engines).
  *
  * Scale shape: one groupBy on the discretized value (or token), one
  * value-domain-bounded global cumulative window (KS), one top-k.
  * The global window is a single-partition sort over DISTINCT
  * values, not rows — bounded by the value domain (a discretized
  * feature), the same bound the [[Skyline]] merge documents. For an
  * unbounded-domain feature, bucket it first (that discretization is
  * part of the screen's definition, not a shortcut).
  *
  * Overflow headroom: every cross product is `count_a * total_b`
  * (longs) — exact to ~9.2e18, i.e. two slices of ~3e9 observations
  * each. Beyond that, lift the same expressions to decimal(38,0);
  * the shapes are unchanged.
  */
object Drift {

  /** Exact two-sample Kolmogorov–Smirnov over a discrete/discretized
    * value: one row with the scaled KS numerator
    * `ks_num = max_v |cumA(v)·nB - cumB(v)·nA|`, the smallest value
    * attaining it (`ks_at`), the slice sizes, and the conventional
    * statistic `ks = ks_num / (nA·nB)`.
    *
    * Cardinality contract, ENFORCED (VERDICT r14 #6): the cumulative
    * window sorts the DISTINCT-value frame in one partition — fine
    * for the discrete/discretized values this screen is defined
    * over, a scale-killer if a caller passes a raw continuous double
    * column (every row becomes a distinct value). The plan carries an
    * `assert_true` on the distinct-value count, riding the same
    * single-partition window that computes the totals (no extra
    * job): past `maxDistinctValues` (default 2^20 — a 1M-row
    * single-partition sort, comfortably one task) the query FAILS
    * LOUDLY with a pre-bucketing instruction instead of silently
    * single-tasking the corpus. Discretize first (floor(value/w) —
    * the [[psiFixedBuckets]] recipe); that bucketing is part of the
    * screen's definition, not a shortcut.
    *
    * @param inA boolean column: true → slice A, false → slice B */
  def ksStatistic(df: DataFrame, value: Column, inA: Column,
                  maxDistinctValues: Long = 1L << 20): DataFrame = {
    require(maxDistinctValues >= 1, "maxDistinctValues must be >= 1")
    val per = df.select(value.as("v"), inA.cast("long").as("__a"))
      .groupBy("v")
      .agg(sum("__a").as("__ca"),
        (count(lit(1)) - sum("__a")).as("__cb"))
    val cumW = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .select(col("v"),
        sum("__ca").over(cumW).as("__cumA"),
        sum("__cb").over(cumW).as("__cumB"),
        sum("__ca").over(allW).as("n_a"),
        sum("__cb").over(allW).as("n_b"),
        count(lit(1)).over(allW).as("__card"))
      // the guard lives in a FILTER (assert_true(ok) is NULL on
      // success -> coalesce true) so column pruning can never drop
      // it; it reads a window output, so it cannot be pushed below
      // the window either
      .where(coalesce(assert_true(
        col("__card") <= lit(maxDistinctValues),
        lit(s"ksStatistic: distinct value count exceeds " +
          s"$maxDistinctValues — the KS cumulative window sorts the " +
          "distinct-value frame in ONE partition. Discretize the " +
          "value first (e.g. floor(value / width)) or raise " +
          "maxDistinctValues deliberately.")), lit(true)))
      .withColumn("ks_num",
        abs(col("__cumA") * col("n_b") - col("__cumB") * col("n_a")))
      .orderBy(desc("ks_num"), asc("v"))
      .limit(1)
      .select(col("n_a"), col("n_b"), col("v").as("ks_at"), col("ks_num"),
        (col("ks_num").cast("double")
          / (col("n_a") * col("n_b")).cast("double")).as("ks"))
  }

  /** Population stability index over FIXED-WIDTH buckets — the
    * standard "did the score distribution move" screen between a
    * reference slice A and a comparison slice B. Fixed-width buckets
    * (not quantile deciles) keep the binning a pure function of the
    * value, so both engines bucket identically; +1 Laplace smoothing
    * makes empty buckets well-defined without an epsilon fudge.
    *
    * Per bucket: `term = (pA − pB)·ln(pA/pB)` with
    * `pX = (cX + 1)/(nX + buckets)` — emitted as INTEGER MICRO-UNITS
    * (`round(term·10^6)`), so the PSI total is an exact integer sum
    * (a float Σ over buckets would be summation-order-dependent; ten
    * rounded doubles are not, integers always are). One bucketed
    * count aggregate + a buckets-sized spine join; nothing shuffles
    * but the (bucket, slice) counts. */
  def psiFixedBuckets(df: DataFrame, value: Column, inA: Column,
                      bucketWidth: Double, nBuckets: Int): DataFrame = {
    require(bucketWidth > 0 && nBuckets >= 2, "need width > 0, >= 2 buckets")
    val spark = df.sparkSession
    val counts = df
      // clamp BOTH ends: an unclamped negative value would land in
      // bucket -1 and silently vanish through the spine join (while
      // out-of-range-high values clamp into the top bucket) — the
      // distribution must never truncate asymmetrically
      .select(greatest(least(floor(value / bucketWidth),
          lit(nBuckets - 1)), lit(0L))
          .cast("long").as("bucket"),
        inA.cast("long").as("__a"))
      .groupBy("bucket")
      .agg(sum("__a").as("c_a"), (count(lit(1)) - sum("__a")).as("c_b"))
    val spine = spark.range(nBuckets).select(col("id").as("bucket"))
    val full = spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val allW = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val k = lit(nBuckets.toDouble)
    val withTotals = full
      .withColumn("n_a", sum("c_a").over(allW))
      .withColumn("n_b", sum("c_b").over(allW))
    val pA = (col("c_a") + lit(1.0)) / (col("n_a") + k)
    val pB = (col("c_b") + lit(1.0)) / (col("n_b") + k)
    withTotals
      .withColumn("term_micro",
        round((pA - pB) * log(pA / pB) * lit(1000000.0), 0).cast("long"))
      .withColumn("psi_micro", sum("term_micro").over(allW))
      .select("bucket", "c_a", "c_b", "n_a", "n_b", "term_micro",
        "psi_micro")
  }

  /** Token-level rate-drift screen: explode `tokens`, count per
    * (token, slice), and rank tokens by the exact scaled rate
    * difference `|cnt_a·nB - cnt_b·nA|` (the cross-multiplied form of
    * `|cnt_a/nA - cnt_b/nB|` — totals are TOKEN totals, so the rate
    * is each token's share of its slice's token mass). Returns the
    * `topK` most-drifted tokens with their counts and the SIGNED
    * scaled difference (positive → over-represented in A).
    *
    * This is the exact-integer core of a chi-squared/G-test screen:
    * `cnt_a·nB - cnt_b·nA` is the 2×2 determinant `ad - bc` whose
    * square drives the chi-squared numerator; ranking by |det| ranks
    * by per-token evidence of drift without ever leaving integers. */
  def tokenRateDiff(df: DataFrame, tokens: Column, inA: Column,
                    topK: Int): DataFrame = {
    val tok = df.select(explode(tokens).as("token"),
      inA.cast("long").as("__a"))
    val per = tok.groupBy("token")
      .agg(sum("__a").as("cnt_a"),
        (count(lit(1)) - sum("__a")).as("cnt_b"))
    val totals = per.agg(sum("cnt_a").as("n_a"), sum("cnt_b").as("n_b"))
    per.crossJoin(broadcast(totals))
      .withColumn("diff_num",
        col("cnt_a") * col("n_b") - col("cnt_b") * col("n_a"))
      .orderBy(abs(col("diff_num")).desc, asc("token"))
      .limit(topK)
      .select("token", "cnt_a", "cnt_b", "diff_num")
  }

  /** ROLLING population-stability monitoring: PSI of each period's
    * value distribution against a leading-baseline distribution (the
    * first `baselineDays` periods) — the production drift DASHBOARD
    * shape ("alert when any day drifts from launch week"), vs
    * [[psiFixedBuckets]]' one-shot two-sample comparison.
    *
    * Scale shape: ONE corpus scan produces the (period, bucket)
    * count frame (map-side combined, ≤ periods×buckets rows); the
    * baseline is an ≤ nBuckets-row aggregate of that frame,
    * broadcast back over it — per-period PSI terms are computed on
    * the bounded frame, never by re-scanning the corpus per period.
    * The smoothing, micro-rounding, and both-ends bucket clamp are
    * exactly [[psiFixedBuckets]]' (same certified arithmetic).
    *
    * @param period  grouping column (e.g. `to_date(ts)`), any
    *                orderable type
    * @param baselineDays number of LOWEST period values forming the
    *                baseline (boundary found on the bounded count
    *                frame, not the corpus)
    * @return (period, n_period, psi_micro) — one row per period,
    *         including the baseline periods themselves (whose drift
    *         against the pooled baseline is near zero) */
  def rollingPsi(df: DataFrame, value: Column, period: Column,
                 baselineDays: Int, bucketWidth: Double,
                 nBuckets: Int): DataFrame = {
    require(bucketWidth > 0 && nBuckets >= 2 && baselineDays >= 1,
      "need width > 0, >= 2 buckets, >= 1 baseline period")
    val spark = df.sparkSession
    val counts = df
      .select(period.as("period"),
        greatest(least(floor(value / bucketWidth), lit(nBuckets - 1)),
          lit(0L)).cast("long").as("bucket"))
      .groupBy("period", "bucket").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // baseline cutoff: the baselineDays-th distinct period, found on
    // the bounded frame (periods×buckets rows)
    val cutoff = counts.select(col("period")).distinct()
      .orderBy("period").limit(baselineDays)
      .agg(max("period").as("cut"))
    val baseline = counts.join(broadcast(cutoff),
        col("period") <= col("cut"), "left_semi")
      .groupBy("bucket").agg(sum("c").as("c_b"))
    val spine = counts.select("period").distinct()
      .crossJoin(spark.range(nBuckets).select(col("id").as("bucket")))
    val k = lit(nBuckets.toDouble)
    val full = spine
      .join(counts, Seq("period", "bucket"), "left")
      .join(broadcast(baseline), Seq("bucket"), "left")
      .select(col("period"), col("bucket"),
        coalesce(col("c"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
    val wP = Window.partitionBy("period")
    val withTotals = full
      .withColumn("n_a", sum("c_a").over(wP))
      .withColumn("n_b", sum("c_b").over(wP))
    val pA = (col("c_a") + lit(1.0)) / (col("n_a") + k)
    val pB = (col("c_b") + lit(1.0)) / (col("n_b") + k)
    val out = withTotals
      .withColumn("term_micro",
        round((pA - pB) * log(pA / pB) * lit(1000000.0), 0).cast("long"))
      .groupBy("period")
      .agg(max("n_a").as("n_period"), sum("term_micro").as("psi_micro"))
    val materialized = out.localCheckpoint(true)
    counts.unpersist()
    materialized
  }

  /** One-sided CUSUM change-point screen (Page 1954) per key over
    * period totals, in EXACT integer arithmetic — the sequential
    * mean-shift detector that complements [[rollingPsi]]'s
    * distribution drift: PSI asks "does today's SHAPE differ from the
    * baseline", CUSUM asks "has the LEVEL been persistently above it"
    * (small sustained shifts accumulate; one outlier day decays).
    *
    * All quantities are scaled by `baselineDays` so the baseline MEAN
    * never becomes a rounded float: with `T_p` = Σ floor(value) over
    * period `p` and `B` = Σ T_p over the first `baselineDays` periods
    * (per key),
    *
    *   S_p = max(0, S_{p-1} + D·T_p − B − D·slack),  S_0 = 0
    *
    * where D = baselineDays — i.e. the cumulative excess of D·T over
    * the exact baseline total, drained by `slack` per period. The
    * recursion's max(0, ·) clamp makes it NON-associative: no window
    * function expresses it, so it runs as a per-key sorted scan
    * ([[graft.query.QueryOps.ewmaScan]]'s contract: keys are
    * entity-sized, periods per key are bounded), and the oracle
    * replays the identical integer sequence as a recursive CTE.
    *
    * Output: (key, period, total, s_scaled, alarm) — `s_scaled` is
    * S_p (D× the conventional CUSUM), `alarm` = S_p > D·threshold.
    * Scale shape: one map-side-combined aggregate to the (key,
    * period) frame; the scan runs on that bounded frame, never the
    * corpus. */
  def cusumDaily(df: DataFrame, value: Column, period: Column,
                 key: Column, baselineDays: Int, slack: Long,
                 threshold: Long): DataFrame = {
    require(baselineDays >= 1, "baselineDays must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val totals = df
      .select(key.cast("string").as("key"), period.as("period"),
        floor(value).cast("long").as("__v"))
      .groupBy("key", "period").agg(sum("__v").as("total"))
    val d = baselineDays.toLong
    val w = Window.partitionBy("key").orderBy("period")
    val withBase = totals
      .withColumn("__rn", row_number().over(w))
      .withColumn("__base",
        sum(when(col("__rn") <= d, col("total"))).over(
          Window.partitionBy("key")))
    withBase
      .select(col("key"), col("period").cast("string").as("period"),
        col("total"), col("__rn"), col("__base"))
      .as[(String, String, Long, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        // scan in __rn order — the TYPED period order the baseline
        // window used; sorting the cast strings would mis-order any
        // non-string period (e.g. integer periods 1,10,11,…,2)
        val rows = it.toSeq.sortBy(_._4)
        var s = 0L
        rows.iterator.map { case (_, period, total, _, base) =>
          s = math.max(0L, s + d * total - base - d * slack)
          (k, period, total, s, s > d * threshold)
        }
      }
      .toDF("key", "period", "total", "s_scaled", "alarm")
  }
}
