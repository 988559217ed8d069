package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  *
  * All probes rename their inputs to reserved `__`-prefixed aliases
  * up front and compute with Column arithmetic from there — column
  * names needing backticks (dots, spaces, hyphens) pass through
  * unmangled (r12 verdict: the interpolated-SQL form broke on them).
  */
object IntervalPlan {

  /** Long-exact integer `div` over one of this planner's own reserved
    * aliases — the interpolation is safe because the name is ours, not
    * the caller's. */
  private def bdiv(alias: String, w: Long): Column =
    expr(s"$alias div ${w}L")

  /** A caller-supplied column name as a Column, backtick-quoted so
    * names with dots/spaces resolve as TOP-LEVEL attributes (a bare
    * `col("start.us")` would resolve as field `us` of struct
    * `start`). Embedded backticks escape by doubling. */
  private def ref(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

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
      .agg(percentile_approx(
        ref(eCol).cast("long") - ref(sCol).cast("long") + lit(1L),
        lit(lenQuantile), lit(10000)).cast("long").as("w"))
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
    * the worst count squared).
    *
    * Returned as a Double: the probe exists precisely for the regime
    * where per-bucket counts reach billions, and a long multiply
    * wraps negative there (ADVICE r12) — the guard only needs
    * magnitude, and a double's 52-bit mantissa is exact far past any
    * budget a caller could accept anyway. */
  def hotBucketProduct(left: DataFrame, sL: String, eL: String,
                       right: DataFrame, sR: String, eR: String,
                       bucketWidth: Long): Double = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    def perBucket(df: DataFrame, s: String, e: String) = df
      .select(ref(s).cast("long").as("__s"), ref(e).cast("long").as("__e"))
      .select(explode(sequence(bdiv("__s", bucketWidth),
        bdiv("__e", bucketWidth))).as("__b"))
      .groupBy("__b").agg(count(lit(1)).cast("double").as("n"))
    val prod = perBucket(left, sL, eL).as("l")
      .join(perBucket(right, sR, eR).as("r"), "__b")
      .agg(max(col("l.n") * col("r.n")).as("p"))
      .head()
    if (prod.isNullAt(0)) 0.0 else prod.getDouble(0)
  }

  /** One-pass sizing + loud check for the SELF-join case — what
    * [[IntervalJoin.selfOverlapPairsAuto]] runs by default. Returns
    * the `lenQuantile` width after verifying both budgets, in exactly
    * TWO aggregates over the table (vs five for sizing +
    * two-sided [[requireFit]]): the sizing scan also counts rows, and
    * because both join sides are the same frame the worst per-bucket
    * product is simply `max(n)²` and the mean fan-out is
    * `Σn / rows` — one count-per-bucket aggregate yields both, no
    * bucket-wise join needed. Failure messages match [[requireFit]]'s
    * (same two remedies). */
  def planSelf(df: DataFrame, sCol: String, eCol: String,
               lenQuantile: Double = 0.9,
               maxMeanFanOut: Double = 8.0,
               maxHotBucketProduct: Double = 1e8): Long = {
    require(lenQuantile > 0.0 && lenQuantile <= 1.0,
      s"lenQuantile must be in (0, 1], got $lenQuantile")
    // rows = BOTH-BOUNDS-NON-NULL count, not count(*): a NULL-bound
    // row produces no bucket registrations (sequence(NULL,·) is NULL,
    // explode drops it), so dividing Σn by count(*) would understate
    // the fan-out on heavily-null tables — passing planSelf while
    // requireFit (whose avg already skips NULL fan-outs) fails the
    // same width (ADVICE r13).
    val sized = df.agg(
      percentile_approx(
        ref(eCol).cast("long") - ref(sCol).cast("long") + lit(1L),
        lit(lenQuantile), lit(10000)).cast("long").as("w"),
      count(when(ref(sCol).isNotNull && ref(eCol).isNotNull, 1))
        .as("n")).head()
    require(!sized.isNullAt(0),
      "bucketWidthFor over an empty interval table — no length " +
        "distribution to size from")
    val w = math.max(1L, sized.getLong(0))
    val rows = sized.getLong(1)
    val pb = df
      .select(ref(sCol).cast("long").as("__s"),
        ref(eCol).cast("long").as("__e"))
      .select(explode(sequence(bdiv("__s", w), bdiv("__e", w))).as("__b"))
      .groupBy("__b").agg(count(lit(1)).cast("double").as("n"))
      .agg(max(col("n")).as("mx"), sum(col("n")).as("regs")).head()
    val meanFanOut = pb.getDouble(1) / rows
    require(meanFanOut <= maxMeanFanOut,
      f"interval join under-bucketed: width $w implies mean " +
        f"per-row fan-out $meanFanOut%.1f > $maxMeanFanOut%.1f buckets " +
        f"(the shuffle carries every registration); size the width " +
        f"from the length distribution with IntervalPlan.bucketWidthFor")
    val hot = pb.getDouble(0) * pb.getDouble(0)
    require(hot <= maxHotBucketProduct,
      f"interval join has a hot bucket: worst per-bucket candidate " +
        f"product $hot%.3g > $maxHotBucketProduct%.3g at width $w. " +
        f"If the bucket aggregates many DISJOINT intervals, shrink the " +
        f"width (same credited pairs, spread registrations); if it is " +
        f"a true overlap pile-up (one popular instant), enable AQE " +
        f"skew-join splitting (plain equi-join on __b) or pre-split " +
        f"the hot key range")
    w
  }

  /** Loud guard for a chosen width (the [[LshPlan.requireFit]] twin):
    * fails when the width implies mean per-row fan-out above
    * `maxMeanFanOut` (width too small — shuffled registrations blow
    * up linearly) or a per-bucket join product above
    * `maxHotBucketProduct` (one straggler bucket — quadratic).
    * Callers hitting the first should size with [[bucketWidthFor]];
    * callers hitting the second at an already-sized width have a
    * genuine pile-up and want AQE skew-join splitting or pre-split
    * hot keys. Cost: two aggregates over the interval tables —
    * noise next to the join it sizes, which is why
    * [[IntervalJoin.selfOverlapPairsAuto]] runs it by default. */
  def requireFit(left: DataFrame, sL: String, eL: String,
                 right: DataFrame, sR: String, eR: String,
                 bucketWidth: Long,
                 maxMeanFanOut: Double = 8.0,
                 maxHotBucketProduct: Double = 1e8): Unit = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    def fanOut(df: DataFrame, s: String, e: String) = df
      .select(ref(s).cast("long").as("__s"), ref(e).cast("long").as("__e"))
      .select((bdiv("__e", bucketWidth) - bdiv("__s", bucketWidth)
        + lit(1L)).cast("double").as("f"))
    val mf = fanOut(left, sL, eL).unionAll(fanOut(right, sR, eR))
      .agg(avg(col("f"))).head()
    val meanFanOut = if (mf.isNullAt(0)) 1.0 else mf.getDouble(0)
    require(meanFanOut <= maxMeanFanOut,
      f"interval join under-bucketed: width $bucketWidth implies mean " +
        f"per-row fan-out $meanFanOut%.1f > $maxMeanFanOut%.1f buckets " +
        f"(the shuffle carries every registration); size the width " +
        f"from the length distribution with IntervalPlan.bucketWidthFor " +
        f"≈ ${bucketWidthFor(left.select(ref(sL).as("s"), ref(eL).as("e"))
          .unionAll(right.select(ref(sR).as("s"), ref(eR).as("e"))),
          "s", "e")} instead")
    val hot = hotBucketProduct(left, sL, eL, right, sR, eR, bucketWidth)
    require(hot <= maxHotBucketProduct,
      f"interval join has a hot bucket: worst per-bucket candidate " +
        f"product $hot%.3g > $maxHotBucketProduct%.3g at width " +
        f"$bucketWidth. If the bucket aggregates many DISJOINT " +
        f"intervals, shrink the width (same credited pairs, spread " +
        f"registrations); if it is a true overlap pile-up (one popular " +
        f"instant), enable AQE skew-join splitting (plain equi-join on " +
        f"__b) or pre-split the hot key range")
  }
}
