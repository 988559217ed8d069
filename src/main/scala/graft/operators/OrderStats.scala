package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed order statistics for LOW-CARDINALITY groups over
  * arbitrarily large data — the "p05/p95 of a metric per category"
  * shape where `Window.partitionBy(category)` is a scale trap: a
  * per-category window funnels each category through ONE task, so
  * three categories at 100 TB means three tasks sort everything.
  *
  * This operator is the classic two-pass distributed selection
  * instead:
  *   1. range-repartition on (group, value) and sort WITHIN partitions
  *      (balanced by the range partitioner's sampling — no
  *      single-reducer group);
  *   2. count rows per (partition, group) — a partitions×groups-sized
  *      side table collected to the driver;
  *   3. prefix-sum those counts in partition order to locate, for each
  *      requested fraction, the partition and in-partition offset of
  *      the k-th element (`k = ceil(num·n/den)` in exact integer
  *      arithmetic — an EXISTING data value, no interpolation);
  *   4. a second pass reads just the located offsets.
  *
  * The selected VALUE is a pure function of the (group, value)
  * multiset — partition boundaries (sampled, but seeded
  * deterministically) cannot change which element is the k-th — so
  * the result is exactly what a global per-group sort would give,
  * hash-certifiable against a window-function oracle.
  */
object OrderStats {

  /** @param df       input
    * @param groupCol low-cardinality group column (read as string)
    * @param valueCol numeric column, cast to double (callers with
    *                 decimals beyond 2^53 significance should rescale)
    * @param fracs    fractions as EXACT rationals (num, den) in
    *                 (0, 1] — `k = ceil(num·n / den)` in pure integer
    *                 arithmetic. A double fraction would silently
    *                 disagree with an integer-arithmetic oracle:
    *                 0.05 · 20 = 1.0000000000000002 in binary, so
    *                 `ceil` lands on 2, not 1.
    * @param maxGroupsPerPartition loud upper bound on the per-task
    *                 group cardinality. The driver-side locator frame
    *                 is (partitions × groups-per-partition) rows; this
    *                 operator's contract is LOW-cardinality groups (a
    *                 handful of categories over arbitrarily many
    *                 rows). A per-USER quantile at 100 TB would
    *                 otherwise collect millions of rows to the driver
    *                 silently — that shape belongs to a per-key window
    *                 (`percentile` over `Window.partitionBy(user)`:
    *                 millions of SMALL groups is exactly where windows
    *                 scale), not to two-pass global selection.
    * @return (group, num, den, value) — one row per group×fraction */
  def discQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                    fracs: Seq[(Long, Long)],
                    maxGroupsPerPartition: Int = 10000): DataFrame = {
    require(fracs.nonEmpty && fracs.forall {
        case (num, den) => num > 0 && den > 0 && num <= den
      }, "fracs must be rationals in (0, 1]")
    require(maxGroupsPerPartition >= 1,
      "maxGroupsPerPartition must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // a null (or a value whose double cast yields null) would
    // otherwise surface as an opaque encoder error at job runtime —
    // and, worse, nulls sort first, so one could be SELECTED as a
    // quantile value. Fail loudly at the scan instead (the
    // Hits/Skyline convention), riding the existing expression —
    // no extra job.
    val vc = col(valueCol).cast("double")
    val vGuarded = coalesce(
      assert_true(vc.isNotNull,
        lit(s"OrderStats.discQuantiles: null in `$valueCol` (or a " +
          "value that does not cast to double) — filter or repair " +
          "nulls upstream; a null would sort first and could be " +
          "selected as a quantile value")).cast("double"),
      lit(0.0)) + vc
    val sorted = df
      .select(col(groupCol).cast("string").as("g"), vGuarded.as("v"))
      .repartitionByRange(parts, col("g"), col("v"))
      .sortWithinPartitions("g", "v")
      .as[(String, Double)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // pass 1: (partition, group) counts — partitions×groups rows.
    // The per-task cardinality bound keeps the collected frame ≤
    // partitions × maxGroupsPerPartition BEFORE anything reaches the
    // driver (range partitioning clusters groups, so a
    // high-cardinality input trips this on every task, loudly).
    val maxG = maxGroupsPerPartition
    val counts: Array[(Int, String, Long)] = sorted
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { case (g, _) =>
          m.update(g, m.getOrElse(g, 0L) + 1L)
          require(m.size <= maxG,
            s"OrderStats.discQuantiles: more than $maxG distinct " +
              "groups in one partition — this operator is for " +
              "low-cardinality groups over big data; for per-entity " +
              "quantiles (many small groups) use a percentile over " +
              "Window.partitionBy(entity), which scales there, or " +
              "raise maxGroupsPerPartition deliberately")
        }
        m.iterator.map { case (g, c) => (pid, g, c) }
      }.collect()

    // driver: prefix sums in partition order -> (pid, group, local
    // offset 1-based) per requested (group, frac)
    val totals = counts.groupBy(_._2).view
      .mapValues(_.map(_._3).sum).toMap
    val targets = scala.collection.mutable
      .Map.empty[Int, List[(String, (Long, Long), Long)]]
    for ((g, n) <- totals) {
      val run = counts.filter(_._2 == g).sortBy(_._1)
      for (f <- fracs) {
        val k = (f._1 * n + f._2 - 1L) / f._2 // = ceil(num*n/den) >= 1
        var remaining = k
        var located: Option[(Int, Long)] = None
        for ((p, _, c) <- run if located.isEmpty) {
          if (remaining <= c) located = Some((p, remaining))
          else remaining -= c
        }
        // k <= n, so the walk always lands; fall back to the last
        // element defensively rather than throwing mid-driver
        val (pid, local) = located.getOrElse {
          val last = run.last; (last._1, last._3)
        }
        targets.update(pid, (g, f, local) :: targets.getOrElse(pid, Nil))
      }
    }

    // pass 2: read only the located offsets
    val bc = spark.sparkContext.broadcast(targets.toMap)
    val picked: Array[(String, Long, Long, Double)] = sorted
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        bc.value.get(pid) match {
          case None => Iterator.empty
          case Some(wants) =>
            val seen = scala.collection.mutable
              .Map.empty[String, Long]
            val out = scala.collection.mutable
              .ArrayBuffer.empty[(String, Long, Long, Double)]
            val byGroup = wants.groupBy(_._1)
            it.foreach { case (g, v) =>
              byGroup.get(g).foreach { fs =>
                val pos = seen.getOrElse(g, 0L) + 1L
                seen.update(g, pos)
                fs.foreach { case (_, f, local) =>
                  if (local == pos) out += ((g, f._1, f._2, v))
                }
              }
            }
            out.iterator
        }
      }.collect()
    sorted.unpersist()
    spark.createDataFrame(picked.toSeq)
      .toDF("group", "num", "den", "value")
  }
}
