package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval–interval OVERLAP join — "which ranges intersect" (session
  * vs session, validity window vs validity window, reservation vs
  * reservation), the two-sided generalization of the point-in-range
  * J2 join ([[RangeJoin]] covers point ∈ range; this covers
  * range ∩ range ≠ ∅ for closed integer intervals
  * `max(start) ≤ min(end)`).
  *
  * Scale shape — bucketed equi-join, never a cross product: every
  * interval registers in the `bucketWidth`-wide buckets it touches
  * (`start div w .. end div w` — fan-out per row is
  * `⌈len/w⌉ + 1`, so callers size `w` near the typical interval
  * length), candidates co-bucket, and the exact predicate filters.
  * Pair DEDUP costs nothing: instead of a distinct over the pair
  * stream, a pair is CREDITED only in the single bucket containing
  * `max(start_a, start_b)` — a point both intervals cover whenever
  * they overlap, so each true pair survives in exactly one bucket
  * (the spatial-join reference-point rule). The shuffle therefore
  * carries the bucket expansion once and no dedup exchange exists in
  * the plan.
  *
  * Sizing and skew are a PLANNER, not a footnote ([[IntervalPlan]],
  * round 12 — the [[LshPlan]] promotion): [[IntervalPlan.bucketWidthFor]]
  * sizes the width from the interval-length distribution in one
  * aggregate, and [[IntervalPlan.requireFit]] fails loudly on mean
  * fan-out or hot-bucket products, distinguishing the
  * shrink-the-width remedy (wide bucket over disjoint intervals) from
  * the AQE-skew-split remedy (true pile-up — the join is a plain
  * equi-join on `__b`, so AQE's split applies as-is). */
object IntervalJoin {

  /** Overlapping pairs between `left` and `right` (closed integer
    * intervals, non-negative bounds, start ≤ end enforced per row by
    * an inline guard). Returns (id_a, s_a, e_a, id_b, s_b, e_b,
    * overlap) with `overlap = min(e)−max(s)+1` ≥ 1. */
  def overlapPairs(left: DataFrame, idL: String, sL: String, eL: String,
                   right: DataFrame, idR: String, sR: String, eR: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    def expand(df: DataFrame, id: String, s: String, e: String,
               pid: String, ps: String, pe: String) = {
      val guard = coalesce(
        assert_true(col(ps) >= 0 && col(ps) <= col(pe),
          lit(s"interval join requires 0 <= start <= end " +
            s"(violated by a ($s, $e) row)")).cast("long"),
        lit(0L))
      df.select(col(id).as(pid), col(s).as(ps), col(e).as(pe))
        .select(col(pid), (guard + col(ps)).as(ps), col(pe))
        .withColumn("__b", explode(expr(
          s"sequence($ps div ${bucketWidth}L, $pe div ${bucketWidth}L)")))
    }
    val l = expand(left, idL, sL, eL, "id_a", "s_a", "e_a")
    val r = expand(right, idR, sR, eR, "id_b", "s_b", "e_b")
    l.join(r, Seq("__b"))
      .filter(greatest(col("s_a"), col("s_b")) <=
        least(col("e_a"), col("e_b")))
      // credit rule: count the pair only in max(start)'s bucket
      .filter(col("__b") ===
        expr(s"greatest(s_a, s_b) div ${bucketWidth}L"))
      .select(col("id_a"), col("s_a"), col("e_a"),
        col("id_b"), col("s_b"), col("e_b"),
        (least(col("e_a"), col("e_b")) -
          greatest(col("s_a"), col("s_b")) + 1L).as("overlap"))
  }

  /** Self-join form: unordered overlapping pairs within one interval
    * table, each pair once with id_a < id_b. */
  def selfOverlapPairs(df: DataFrame, idCol: String, sCol: String,
                       eCol: String, bucketWidth: Long): DataFrame =
    overlapPairs(df, idCol, sCol, eCol, df, idCol, sCol, eCol,
      bucketWidth)
      .filter(col("id_a") < col("id_b"))

  /** Self-join with the width DERIVED from the observed interval-length
    * distribution ([[IntervalPlan.bucketWidthFor]], p90 by default) —
    * the [[DensityCluster.dbscanCosineAuto]] shape: one sizing
    * aggregate, then the same credit-rule join, whose pair set is
    * width-invariant, so the derived width can only change the plan's
    * cost, never its answer.
    *
    * With `check = true` (the default) sizing goes through
    * [[IntervalPlan.planSelf]], which also verifies the fan-out and
    * hot-bucket budgets: sizing alone cannot catch a TRUE pile-up
    * (everything covering one popular instant lands in that instant's
    * bucket at any width), so the probe — the self-join collapses it
    * to two aggregates total, noise next to the join they gate —
    * fails loudly with the AQE-skew-split remedy instead of leaving
    * one straggler task to time out at 100 TB. Callers that have
    * already profiled their distribution pass `check = false`. */
  def selfOverlapPairsAuto(df: DataFrame, idCol: String, sCol: String,
                           eCol: String, check: Boolean = true): DataFrame = {
    val w =
      if (check) IntervalPlan.planSelf(df, sCol, eCol)
      else IntervalPlan.bucketWidthFor(df, sCol, eCol)
    selfOverlapPairs(df, idCol, sCol, eCol, w)
  }
}
