package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted incremental EXACT histogram index — the fourth member of
  * the persisted-index family ([[SketchOps]] HLL = distinct counts,
  * [[CmsIndex]] = frequencies, [[BloomIndex]] = membership, this =
  * value DISTRIBUTION), and the only one whose incremental claim
  * needs no sketch argument at all: per batch it banks fixed-bin LONG
  * counts, merge is counter ADDITION over an identical bin spec, so
  * the loaded base+deltas profile EQUALS the full-history profile
  * row-for-row — the DuckDB oracle replays every count bit-for-bit
  * (q_value_profile_inc), no envelope, no bit-identity argument, no
  * confidence parameter.
  *
  * Layout and semantics are the [[IndexStore]] contract: bin spec
  * (lo, width, nBins) pinned under `path/params` (appends bin at the
  * STORED spec — counts over different edges would be silently
  * meaningless), `delta_<tag>` overwrite for replay idempotence (like
  * CMS, addition is not idempotent: the overwrite carries the replay
  * burden), NULL values excluded. Out-of-range values land in
  * underflow/overflow bins (-1 and nBins) rather than being dropped:
  * a profile that silently discards the tail is how drift goes
  * unnoticed.
  *
  * Scale shape: each batch scans its OWN rows once into ≤ nBins + 2
  * rows; the load unions (batches × bins) tiny rows and re-sums.
  * Cross-day value-distribution monitoring (the [[Drift]] family's
  * PSI input, quantile drift, SLA percentiles) reads KB of blobs,
  * never event history. Bin edges are computed in IEEE double
  * arithmetic identical across Spark/DuckDB (`floor((v - lo) /
  * width)`), so the exact gate holds cross-engine. */
object HistIndex {

  /** Bin of `v` under the spec: -1 underflow, nBins overflow, else
    * floor((v - lo) / width). */
  def bin(v: Column, lo: Double, width: Double, nBins: Int): Column =
    when(v < lo, lit(-1L))
      .when(v >= lo + width * nBins, lit(nBins.toLong))
      .otherwise(floor((v - lo) / width).cast("long"))

  private def binCounts(df: DataFrame, value: Column, lo: Double,
                        width: Double, nBins: Int): DataFrame =
    df.select(value.as("__v")).where(col("__v").isNotNull)
      .groupBy(bin(col("__v"), lo, width, nBins).as("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Build and persist the base index: (bin, cnt) rows under
    * `path/base`, the bin spec under `path/params`. */
  def saveHistIndex(df: DataFrame, value: Column, path: String,
                    lo: Double, width: Double, nBins: Int): Unit = {
    require(width > 0 && nBins > 0, s"bad bin spec: $lo/$width/$nBins")
    val spark = df.sparkSession
    IndexStore.writeSingle(binCounts(df, value, lo, width, nBins),
      s"$path/base")
    IndexStore.writeParams(spark, path, "lo" -> lo, "width" -> width,
      "nBins" -> nBins)
  }

  /** Stored (lo, width, nBins). */
  def loadParams(spark: SparkSession, path: String)
      : (Double, Double, Int) = {
    val p = IndexStore.params(spark, path)
    (p("lo").toDouble, p("width").toDouble, p("nBins").toInt)
  }

  /** Append a batch at the STORED bin spec; `delta_<tag>` overwrite
    * keeps replays idempotent (addition would double-count a
    * duplicated delta — the CMS caveat, same cure). */
  def appendHistIndex(spark: SparkSession, path: String,
                      batch: DataFrame, value: Column,
                      tag: String): Unit = {
    val (lo, width, nBins) = loadParams(spark, path)
    IndexStore.writeSingle(binCounts(batch, value, lo, width, nBins),
      IndexStore.deltaDir(path, tag))
  }

  /** Sum base + every delta to the EXACT full-history profile:
    * (bin, cnt), one row per non-empty bin. */
  def loadHistogram(spark: SparkSession, path: String): DataFrame =
    IndexStore.unionBatches(spark, path, "", Seq("bin", "cnt"))
      .groupBy("bin")
      .agg(sum("cnt").as("cnt"))

  /** Fold base + every delta into a fresh ONE-batch index at
    * `newPath` (copy-on-write — see [[IndexStore]]): stored bin spec,
    * the summed profile as the new base. Addition is exact, so the
    * compacted index is bit-equal row for row. */
  def compactHistIndex(spark: SparkSession, oldPath: String,
                       newPath: String): Unit = {
    IndexStore.requireCopyOnWrite(oldPath, newPath)
    import spark.implicits._
    val (lo, width, nBins) = loadParams(spark, oldPath)
    IndexStore.writeSingle(loadHistogram(spark, oldPath),
      s"$newPath/base")
    IndexStore.writeParams(spark, newPath, "lo" -> lo, "width" -> width,
      "nBins" -> nBins)
  }

  // ---- per-SEGMENT face (r18 verdict #7): the HLL index's `seg`
  // column shape applied to the exact family — one value profile per
  // segment (per-event-type SLA percentiles, per-source drift inputs)
  // from the same pinned bin spec. A batch banks ≤ segments ×
  // (nBins + 2) rows; merge is still LONG addition per (seg, bin), so
  // the loaded per-segment profile equals the full-history one ROW
  // FOR ROW — the whole output stays oracle-replayable. NULL segments
  // are excluded like NULL values (a profile keyed on nothing is
  // noise, not a tail). ----

  private def segBinCounts(df: DataFrame, seg: Column, value: Column,
                           lo: Double, width: Double,
                           nBins: Int): DataFrame =
    df.select(seg.as("seg"), value.as("__v"))
      .where(col("__v").isNotNull && col("seg").isNotNull)
      .groupBy(col("seg"), bin(col("__v"), lo, width, nBins).as("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** Build and persist the per-segment base index: (seg, bin, cnt)
    * rows under `path/base`, the bin spec under `path/params` (same
    * params row as the global face). */
  def saveHistIndexSeg(df: DataFrame, seg: Column, value: Column,
                       path: String, lo: Double, width: Double,
                       nBins: Int): Unit = {
    require(width > 0 && nBins > 0, s"bad bin spec: $lo/$width/$nBins")
    val spark = df.sparkSession
    IndexStore.writeSingle(segBinCounts(df, seg, value, lo, width, nBins),
      s"$path/base")
    IndexStore.writeParams(spark, path, "lo" -> lo, "width" -> width,
      "nBins" -> nBins)
  }

  /** Append a batch at the STORED bin spec — tag overwrite carries
    * the replay burden exactly as in the global face. */
  def appendHistIndexSeg(spark: SparkSession, path: String,
                         batch: DataFrame, seg: Column, value: Column,
                         tag: String): Unit = {
    val (lo, width, nBins) = loadParams(spark, path)
    IndexStore.writeSingle(
      segBinCounts(batch, seg, value, lo, width, nBins),
      IndexStore.deltaDir(path, tag))
  }

  /** Sum base + every delta to the EXACT per-segment profile:
    * (seg, bin, cnt), one row per non-empty (segment, bin). */
  def loadHistogramSeg(spark: SparkSession, path: String): DataFrame =
    IndexStore.unionBatches(spark, path, "", Seq("seg", "bin", "cnt"))
      .groupBy("seg", "bin")
      .agg(sum("cnt").as("cnt"))

  /** Copy-on-write compaction of the per-segment face — addition is
    * exact, so the compacted index is row-for-row identical. */
  def compactHistIndexSeg(spark: SparkSession, oldPath: String,
                          newPath: String): Unit = {
    IndexStore.requireCopyOnWrite(oldPath, newPath)
    import spark.implicits._
    val (lo, width, nBins) = loadParams(spark, oldPath)
    IndexStore.writeSingle(loadHistogramSeg(spark, oldPath),
      s"$newPath/base")
    IndexStore.writeParams(spark, newPath, "lo" -> lo, "width" -> width,
      "nBins" -> nBins)
  }

  /** Per-SEGMENT quantile read: [[quantileBins]] with every rank
    * computed against its own segment's total — "p95 of yesterday's
    * values PER event type" answered from segments × (nBins + 2) ×
    * |qs| rows of blob work. Output (seg, q, bin, lo_edge, hi_edge,
    * rank, n); segments with zero banked rows are absent (no rank to
    * bound). */
  def quantileBinsSeg(spark: SparkSession, path: String,
                      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1]: $qs")
    val (lo, width, nBins) = loadParams(spark, path)
    import spark.implicits._
    // one load, two consumers (per-seg cum + per-seg totals)
    val hist = loadHistogramSeg(spark, path).localCheckpoint()
    val h = hist
      // segment-keyed window: ≤ nBins + 2 rows per partition
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy("seg").orderBy("bin")))
    val totals = hist.groupBy("seg").agg(sum("cnt").as("n"))
    val qdf = qs.toDF("q")
    h.join(broadcast(totals), Seq("seg"))
      .crossJoin(broadcast(qdf))
      .where(col("cum") >= ceil(col("q") * col("n")))
      .groupBy("seg", "q", "n")
      .agg(min("bin").as("bin"))
      .select(col("seg"), col("q"), col("bin"),
        when(col("bin") === -1L, lit(Double.NegativeInfinity))
          .otherwise(lit(lo) + col("bin") * lit(width)).as("lo_edge"),
        when(col("bin") === nBins.toLong, lit(Double.PositiveInfinity))
          .otherwise(lit(lo) + (col("bin") + 1L) * lit(width))
          .as("hi_edge"),
        ceil(col("q") * col("n")).as("rank"), col("n"))
  }

  /** Quantile read path: for each requested q, the bin containing
    * rank ceil(q·n) — (q, bin, lo_edge, hi_edge, rank, n). Bin-width
    * resolution by construction; EXACT in the sense that the true
    * q-quantile provably lies in [lo_edge, hi_edge). Work is
    * (nBins + 2) × |qs| rows — driver-free and trivially
    * oracle-replayable. Underflow/overflow bins carry -inf/+inf
    * edges. */
  def quantileBins(spark: SparkSession, path: String,
                   qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1]: $qs")
    val (lo, width, nBins) = loadParams(spark, path)
    import spark.implicits._
    // one load, two consumers (cum rows + the total) — localCheckpoint
    // so the blob union isn't recomputed; ≤ nBins + 2 rows
    val hist = loadHistogram(spark, path).localCheckpoint()
    val h = hist
      // bin-spec-bounded unpartitioned window (≤ nBins + 2 rows by
      // construction), never data-bounded
      .withColumn("cum", sum("cnt").over(Window.orderBy("bin")))
    val qdf = qs.toDF("q")
    h.crossJoin(broadcast(hist.agg(sum("cnt").as("n"))))
      .crossJoin(broadcast(qdf))
      .where(col("cum") >= ceil(col("q") * col("n")))
      .groupBy("q", "n")
      .agg(min("bin").as("bin"))
      .select(col("q"), col("bin"),
        when(col("bin") === -1L, lit(Double.NegativeInfinity))
          .otherwise(lit(lo) + col("bin") * lit(width)).as("lo_edge"),
        when(col("bin") === nBins.toLong, lit(Double.PositiveInfinity))
          .otherwise(lit(lo) + (col("bin") + 1L) * lit(width))
          .as("hi_edge"),
        ceil(col("q") * col("n")).as("rank"), col("n"))
  }
}
