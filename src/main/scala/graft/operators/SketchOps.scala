package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate distinct-count tier over MERGEABLE HLL sketches — the
  * scale continuation of [[BitmapOps]]' exact bitmap algebra.
  *
  * Where the tiers meet: the exact bitmap wire tracks DISTINCT-ID
  * COUNT (~2 bytes/id sparse, certified to 10⁹ ids at ~8 MiB/period
  * by the Scale100 id-space leg), so a 10¹²-id period costs ~2 TB of
  * blobs per period — past executor memory for a single rolling
  * window. A DataSketches HLL sketch (Spark 4 ships the
  * `hll_sketch_agg` family natively) is ≤ ~2^lgK bytes FLAT — ~4 KiB
  * at the default lgK = 12 — at relative standard error
  * ≈ 1.04/√2^lgK (~1.6%). Same composability contract as the bitmap
  * frame: the per-period sketch is built from raw events ONCE, and
  * any re-windowing (rolling windows, day → month rollups, segment
  * unions) unions the BLOBS — union is a per-register max, so the
  * result is EXACTLY independent of how the raw rows were
  * partitioned into sketches (SketchOpsSpec pins equality across
  * partitionings and across finer pre-sketching), and duplicates die
  * map-side exactly as in the bitmap aggregate.
  *
  * One honest asymmetry the spec also pins: a sketch built DIRECTLY
  * from raw rows estimates via DataSketches' HIP accumulator, which
  * a union cannot preserve (it falls back to the composite
  * register-based estimate) — so the blob path can differ from a
  * direct single sketch by a fraction of the error envelope (~1%
  * observed). That is the price of mergeability, not a bug: at the
  * scale this tier targets, re-sketching each window from raw events
  * (the only way to keep HIP) is exactly the window× re-scan the
  * operator exists to avoid.
  *
  * Gate note: DuckDB has approx_count_distinct but NOT the
  * DataSketches register layout, so no SQL oracle can replay the
  * estimates — q_rolling_distinct_approx is a rows-only driver check
  * by design, and the correctness burden sits on the spec pair
  * instead: union-associativity is asserted EXACTLY and the estimate
  * is asserted within the published error envelope of the EXACT twin
  * ([[BitmapOps.rollingDistinct]]) on the same input. NULL ids are
  * excluded, matching the bitmap contract. */
object SketchOps {

  /** Per-group HLL sketch blobs: (seg, sk BINARY). The one pass over
    * raw events every downstream re-aggregation builds on. */
  def segmentSketches(df: DataFrame, seg: Column, id: Column,
                      lgK: Int = 12): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(seg.as("seg"), id.as("__id"))
      .where($"__id".isNotNull)
      .groupBy("seg")
      .agg(hll_sketch_agg($"__id", lit(lgK)).as("sk"))
  }

  /** Rolling-window APPROXIMATE distinct counts — the
    * [[BitmapOps.rollingDistinct]] shape with per-period HLL blobs in
    * place of per-(period, bucket) bitmaps: the raw events are
    * scanned ONCE into one ≤ ~2^lgK-byte sketch per period, each
    * sketch fans out to the `window` trailing windows it serves, and
    * `hll_union_agg` merges map-side. Output:
    * (period, n_distinct_approx) for every period PRESENT in the
    * input (gap periods not emitted — same contract as the exact
    * twin). `window = 1` degenerates to per-period estimates. */
  def rollingDistinctApprox(df: DataFrame, period: Column, id: Column,
                            window: Int, lgK: Int = 12): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val daily = df.select(period.cast("long").as("p"), id.as("__id"))
      .where($"p".isNotNull && $"__id".isNotNull)
      .groupBy("p")
      .agg(hll_sketch_agg($"__id", lit(lgK)).as("sk"))
      // one event scan, enforced — two consumers below (present-period
      // set + window fan-out) would otherwise each recompute the
      // aggregate subtree (the rollingDistinct r13 lesson)
      .localCheckpoint(false)
    val present = daily.select($"p".as("period"))
    daily
      .withColumn("period", explode(expr(
        s"sequence(p, p + ${window - 1}L)")))
      .groupBy("period")
      .agg(hll_sketch_estimate(
        hll_union_agg($"sk", lit(false))).as("n_distinct_approx"))
      .join(broadcast(present), Seq("period"), "left_semi")
      .select($"period", $"n_distinct_approx")
  }
}
