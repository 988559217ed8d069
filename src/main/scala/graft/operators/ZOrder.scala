package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.ZOrderOps

/** Z-order (Morton-curve) clustering layout — 2-D data skipping for
  * the lakehouse write path.
  *
  * A linear `ORDER BY x` layout prunes scans filtering on `x` and
  * nothing else; sorting by the interleaved `z(x, y)` key clusters
  * rows that are close in both dimensions into the same files, so the
  * parquet min/max footer stats prune box predicates on `x`, on `y`,
  * or on both. This is the layout story that matters at 100 TB: the
  * cluster never rewrites reads into new operators — it just writes
  * files whose per-file stat ranges are tight in every queried
  * dimension, and every engine's existing stat-based skipping does
  * the rest.
  *
  * The z column is the native codegen'd
  * [[graft.plans.ZOrderExpr graft_zorder]] expression; the write is
  * one range shuffle on z (same cost as a linear sorted write).
  * Dimensions must be pre-normalized into the 21-bit domain — for
  * skewed or floating-point dimensions, rank-bucket first (see
  * [[zorderBuckets]]); for bounded ints, mask-and-go.
  */
object ZOrder {

  /** The interleaved sort key. Inputs: long columns already in the
    * 21-bit domain (higher bits are masked off by the expression). */
  def zkey(x: Column, y: Column): Column =
    graft.plans.GraftExtensions.nativeFn("graft_zorder", x, y)

  /** 3-D Morton key (tenant × time × key layouts). */
  def zkey3(x: Column, y: Column, z: Column): Column =
    graft.plans.GraftExtensions.nativeFn("graft_zorder3", x, y, z)

  /** Width-`buckets` equi-width bucketing of an arbitrary numeric
    * column into the z domain given its (min, max) — the cheap
    * normalizer when bounds are known (one `agg` if not). */
  def zorderBuckets(c: Column, minV: Double, maxV: Double,
                    buckets: Int): Column = {
    require(buckets > 0 && buckets <= (1 << ZOrderOps.Bits),
      s"buckets must fit the ${ZOrderOps.Bits}-bit z domain")
    val span = math.max(maxV - minV, java.lang.Double.MIN_VALUE)
    least(lit(buckets - 1), greatest(lit(0),
      floor((c - minV) / span * buckets))).cast("long")
  }

  /** Rewrite `df` into a z-clustered layout: range-partition on the
    * z key (even file sizes even under correlated dimensions), sort
    * within partitions, drop the helper column. `files` controls the
    * output file count = skipping granularity. */
  def cluster(df: DataFrame, x: Column, y: Column, files: Int): DataFrame = {
    val z = df.withColumn("__z", zkey(x, y))
    z.repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
