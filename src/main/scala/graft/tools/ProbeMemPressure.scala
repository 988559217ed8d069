package graft.tools

import org.apache.spark.sql.DataFrame
import graft.GraftSession

/** Reproduction probe for the r18 driver-sweep slow mode (VERDICT r18
  * what's-wrong #1): six rows flat-elevated 2.5–11× at identical code
  * with every sweep-level check quiet. Hypothesis under test: BLOCK
  * MANAGER SATURATION — localCheckpoint/persist blocks from earlier
  * queries are only unpersisted when the ContextCleaner's weak
  * references get GC'd, and the r18 `-Xms=-Xmx` pin makes full-heap
  * GCs RARE, so a long sweep can enter a window where the storage
  * pool is full of stale blocks: new localCheckpoints land on disk,
  * execution memory is squeezed into spills, and exactly the
  * storage/memory-hungry rows (the six) go flat-slow while scan-bound
  * neighbors and the CPU yardstick stay fast.
  *
  * Protocol: time the six suspect rows on a fresh session (baseline,
  * min-of-2), fill the storage pool with HELD localCheckpoint blocks
  * (references kept, so the cleaner cannot reclaim them — simulating
  * the lag window), re-time the same rows, release, GC, re-time.
  *
  * {{{ sbt "runMain graft.tools.ProbeMemPressure [fillFrames]" }}}
  */
object ProbeMemPressure {
  def main(args: Array[String]): Unit = {
    val fillFrames = args.headOption.map(_.toInt).getOrElse(40)
    val spark = GraftSession.getOrCreate("graft-probe-mempressure")
    spark.sparkContext.setLogLevel("WARN")
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val six = Seq("q_funnel_windowed", "q_fuzzy_jw", "q_sim_ivf_recall",
      "q_lm_quality", "q_drift_rolling_psi", "q_segment_distinct_approx")
    val qs = graft.SparkEntry.queries
    def timeQ(n: String): Double = {
      val t0 = System.nanoTime()
      graft.Bench.force(qs(n)(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    def storageMb: Long = {
      val st = spark.sparkContext.getExecutorMemoryStatus.values
      st.map { case (max, rem) => max - rem }.sum / (1024 * 1024)
    }
    // warmup
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    six.foreach(timeQ)

    println(f"[mempressure] storage used before baseline: $storageMb%d MB")
    val base = six.map(n => n -> Seq(timeQ(n), timeQ(n)).min).toMap
    println(f"[mempressure] storage used after baseline: $storageMb%d MB")

    // fill: HELD references — the cleaner cannot unpersist these, the
    // exact state of a sweep window where cleanup lags
    val held = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (i <- 0 until fillFrames) {
      held += spark.range(0, 4000000L, 1, 8)
        .selectExpr("id", "id * 2 as b",
          "concat('padpadpadpadpadpad', id) as s")
        .localCheckpoint(true)
    }
    println(f"[mempressure] storage used after fill ($fillFrames frames): " +
      f"$storageMb%d MB")
    val pressured = six.map(n =>
      n -> Seq(timeQ(n), timeQ(n)).min).toMap
    val after = storageMb

    // release + GC: the cleaner's reclaim path
    held.clear()
    System.gc(); Thread.sleep(2000); System.gc(); Thread.sleep(2000)
    val released = six.map(n => n -> Seq(timeQ(n), timeQ(n)).min).toMap
    println(f"[mempressure] storage used after release+gc: $storageMb%d MB" +
      f" (was $after%d MB under pressure)")
    println(f"${"query"}%-28s ${"base"}%8s ${"pressured"}%10s ${"ratio"}%6s ${"released"}%9s")
    for (n <- six) {
      println(f"$n%-28s ${base(n)}%8.2f ${pressured(n)}%10.2f " +
        f"${pressured(n) / base(n)}%6.2f ${released(n)}%9.2f")
    }
    spark.stop()
  }
}
