package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sizing discipline for [[IntervalJoin]]'s bucket width — the
  * round-11 lesson-in-a-comment (IntervalJoin's "shrink bucketWidth or
  * pre-split hot keys" skew note) ENCODED AS CODE, the same promotion
  * [[LshPlan]] gave the LSH plane count in round 11.
  *
  * The two failure modes of a hand-picked width:
  *  - '''fan-out''' (width too SMALL for the interval-length
  *    distribution): each row registers in `⌈len/w⌉ + 1` buckets, so
  *    `w ≪ typical len` multiplies the shuffled row count — linear
  *    waste. [[bucketWidthFor]] sizes `w` at a length quantile (p90 by
  *    default: ≥ 90% of rows touch ≤ 2 buckets) from ONE aggregate
  *    over the interval table.
  *  - '''hot bucket''' (width too LARGE, or a genuine pile-up): a
  *    bucket's join cost is `|left ∩ b| · |right ∩ b|` — quadratic
  *    waste that surfaces as one straggler task. [[requireFit]] probes
  *    the max per-bucket product with one count-per-bucket aggregate
  *    per side and fails LOUDLY, distinguishing the two remedies: a
  *    wide bucket aggregating many DISJOINT intervals wants a smaller
  *    width (the registrations spread back out), while a true overlap
  *    pile-up (everything covering one popular day registers in that
  *    day's bucket at ANY width) wants AQE's skew split — which
  *    applies as-is because the join is a plain equi-join on `__b`.
  */
object IntervalPlan {

  /** Bucket width from the interval-length distribution: the
    * `lenQuantile` (default p90) of `end − start + 1`, floored at 1,
    * measured in ONE aggregate. At the default, at least 90% of rows
    * register in ≤ 2 buckets (fan-out `⌈len/w⌉ + 1` with `len ≤ w`),
    * and the result only SIZES the plan — [[IntervalJoin]]'s credit
    * rule makes the pair set width-invariant, so sizing can never
    * change the answer. */
  def bucketWidthFor(df: DataFrame, sCol: String, eCol: String,
                     lenQuantile: Double = 0.9): Long = {
    require(lenQuantile > 0.0 && lenQuantile <= 1.0,
      s"lenQuantile must be in (0, 1], got $lenQuantile")
    val row = df
      .agg(expr(s"approx_percentile($eCol - $sCol + 1, $lenQuantile)")
        .cast("long").as("w"))
      .head()
    require(!row.isNullAt(0),
      "bucketWidthFor over an empty interval table — no length " +
        "distribution to size from")
    math.max(1L, row.getLong(0))
  }

  /** Largest per-bucket join product `|left ∩ b| · |right ∩ b|` a
    * width implies — the cost of the worst bucket's candidate
    * generation. One count-per-bucket aggregate per side (the same
    * `sequence` expansion the join itself plans), joined bucket-wise.
    * Self-join callers pass the same frame twice (the product is then
    * the worst count squared). */
  def hotBucketProduct(left: DataFrame, sL: String, eL: String,
                       right: DataFrame, sR: String, eR: String,
                       bucketWidth: Long): Long = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    def perBucket(df: DataFrame, s: String, e: String) = df
      .select(explode(expr(
        s"sequence($s div ${bucketWidth}L, $e div ${bucketWidth}L)"))
        .as("__b"))
      .groupBy("__b").agg(count(lit(1)).as("n"))
    val prod = perBucket(left, sL, eL).as("l")
      .join(perBucket(right, sR, eR).as("r"), "__b")
      .agg(max(col("l.n") * col("r.n")).as("p"))
      .head()
    if (prod.isNullAt(0)) 0L else prod.getLong(0)
  }

  /** Loud guard for FIXED widths (the [[LshPlan.requireFit]] twin):
    * fails when the width implies mean per-row fan-out above
    * `maxMeanFanOut` (width too small — shuffled registrations blow
    * up linearly) or a per-bucket join product above
    * `maxHotBucketProduct` (one straggler bucket — quadratic).
    * Callers hitting the first should size with [[bucketWidthFor]];
    * callers hitting the second at an already-sized width have a
    * genuine pile-up and want AQE skew-join splitting or pre-split
    * hot keys. */
  def requireFit(left: DataFrame, sL: String, eL: String,
                 right: DataFrame, sR: String, eR: String,
                 bucketWidth: Long,
                 maxMeanFanOut: Double = 8.0,
                 maxHotBucketProduct: Long = 100000000L): Unit = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    val mf = left.select(expr(
        s"$eL div ${bucketWidth}L - $sL div ${bucketWidth}L + 1")
        .cast("double").as("f"))
      .unionAll(right.select(expr(
        s"$eR div ${bucketWidth}L - $sR div ${bucketWidth}L + 1")
        .cast("double").as("f")))
      .agg(avg(col("f"))).head()
    val meanFanOut = if (mf.isNullAt(0)) 1.0 else mf.getDouble(0)
    require(meanFanOut <= maxMeanFanOut,
      f"interval join under-bucketed: width $bucketWidth implies mean " +
        f"per-row fan-out $meanFanOut%.1f > $maxMeanFanOut%.1f buckets " +
        f"(the shuffle carries every registration); size the width " +
        f"from the length distribution with IntervalPlan.bucketWidthFor " +
        f"≈ ${bucketWidthFor(left.select(col(sL).as("s"), col(eL).as("e"))
          .unionAll(right.select(col(sR).as("s"), col(eR).as("e"))),
          "s", "e")} instead")
    val hot = hotBucketProduct(left, sL, eL, right, sR, eR, bucketWidth)
    require(hot <= maxHotBucketProduct,
      s"interval join has a hot bucket: worst per-bucket candidate " +
        s"product $hot > $maxHotBucketProduct at width $bucketWidth. " +
        s"If the bucket aggregates many DISJOINT intervals, shrink the " +
        s"width (same credited pairs, spread registrations); if it is " +
        s"a true overlap pile-up (one popular instant), enable AQE " +
        s"skew-join splitting (plain equi-join on __b) or pre-split " +
        s"the hot key range")
  }
}
