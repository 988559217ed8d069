package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Global row numbering / rank transform at scale.
  * `row_number() OVER (ORDER BY x)` is the textbook single-partition
  * trap: Spark warns, moves every row to one task, and dies at size.
  * The scalable form is the classic zipWithIndex shape:
  * range-repartition on the sort key, count rows per partition (a
  * partition-count-sized side table), prefix-sum those counts on the
  * driver, and add each partition's offset to its local 1-based
  * position — two passes, no global funnel.
  *
  * Ranks are assigned on the TOTAL order of `sortCols`, so callers
  * wanting deterministic output must make the key unique (append a
  * tiebreak column); with a unique key the result is exactly
  * `row_number() OVER (ORDER BY sortCols)` and hash-certifiable
  * against that window oracle.
  */
object GlobalRank {

  /** Appends `rankCol` (1-based global position in `sortCols` order).
    * The input is re-partitioned by range on the sort key; downstream
    * consumers inherit that (useful: the output is globally sorted).
    *
    * Exactly ONE full-frame materialization (the round-11 100× leg's
    * cost driver was TWO: a MEMORY_AND_DISK persist feeding the two
    * passes PLUS an eager localCheckpoint of the output — transiently
    * two whole-table copies, two full writes): the range-partitioned
    * sorted frame is localCheckpoint'd once; the count pass and the
    * lazy offset-attach both read those blocks, and the RETURNED frame
    * stays lazy, so a consumer that prunes (the gate's 1-in-997
    * sample) never pays a second full-frame write. The checkpoint's
    * RDD-level blocks are reference-held by the returned plan and
    * freed by Spark's ContextCleaner when the caller drops the frame —
    * no explicit unpersist needed, no SQL-cache leak. */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column],
                    rankCol: String = "rn"): DataFrame = {
    require(sortCols.nonEmpty, "need at least one sort column")
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val rp = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint(true)
    val counts = rp.toDF().mapPartitions { it =>
      Iterator.single(
        (org.apache.spark.TaskContext.getPartitionId(), it.size.toLong))
    }(org.apache.spark.sql.Encoders.product[(Int, Long)]).collect()
    // offset of partition p (in range order) = Σ counts of partitions
    // before it — a partition-count-sized prefix sum on the driver
    val inOrder = counts.sortBy(_._1)
    val offsetByPid = inOrder.map(_._1)
      .zip(inOrder.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toMap
    val bc = spark.sparkContext.broadcast(offsetByPid)
    val outSchema = org.apache.spark.sql.types.StructType(
      rp.schema.fields :+ org.apache.spark.sql.types.StructField(
        rankCol, org.apache.spark.sql.types.LongType, nullable = false))
    rp.toDF().mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val base = bc.value.getOrElse(pid, 0L)
      var i = 0L
      it.map { row =>
        i += 1L
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (base + i))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
