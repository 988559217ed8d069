package graft.tools

import graft.GraftSession
import graft.query.QueryOps
import graft.query.QueryOps.FunnelScan
import org.apache.spark.sql.functions._

/** FunnelScan mode certification at scale (VERDICT r14 #8): the
  * funnel's one-scan slice can be held as LocalCheckpoint (executor
  * memory+disk blocks, no lineage), DiskPersist (disk-only blocks,
  * lineage kept — the mode added for fact-table-sized slices), or
  * Rescan (re-read the source per step). The r13 scaladoc asserted a
  * rule of thumb without numbers; this probe measures all three on
  * the funnel leg at the given scaled dir (ScaleBench/Scale100
  * fixtures). Usage:
  * {{{ sbt "runMain graft.tools.ProbeFunnelModes /tmp/graft_sf10" }}}
  */
object ProbeFunnelModes {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = GraftSession.getOrCreate("probe-funnel-modes")
    spark.sparkContext.setLogLevel("WARN")
    def run(mode: FunnelScan): Double = {
      val ev = graft.sources.Tables.loadEventsTs(spark, dir)
      val df = QueryOps.funnelSummary(ev, col("user_id"), col("us"),
        col("event_type"), Seq("view", "click", "purchase"),
        maxGap = Some(2L * 86400000000L), scan = mode)
      val t0 = System.nanoTime
      graft.Bench.force(df)
      (System.nanoTime - t0) / 1e9
    }
    // warmup (page cache + codegen), then min-of-2 per mode
    run(FunnelScan.Rescan)
    for (mode <- Seq(FunnelScan.LocalCheckpoint, FunnelScan.DiskPersist,
        FunnelScan.Rescan)) {
      val t = Seq(run(mode), run(mode)).min
      println(f"[funnelmodes] dir=$dir mode=$mode min2=$t%.2fs")
    }
    spark.stop()
  }
}
