package graft.tools

import java.nio.file.{Files, Paths}
import graft.GraftSession

/** Dumps `.explain("formatted")` for named registered queries to
  * individual files — the r20 optimization round's before/after plan
  * evidence (`plans/r20/<query>_{before,after}.txt`). Each query is
  * EXECUTED first (noop-forced, the bench's own action) so the dump is
  * the AQE FINAL plan that actually ran, plus the executed plan's
  * job count from a listener — the measurement the round optimizes.
  *
  * {{{ sbt "runMain graft.tools.PlanDump q_a,q_b <outDir> <suffix> [sfDir]" }}}
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val outDir = args(1)
    val suffix = args(2)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate("graft-plandump")
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val jobCounter = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCounter.incrementAndGet(); ()
        }
      })
    Files.createDirectories(Paths.get(outDir))
    val qs = graft.SparkEntry.queries
    val unknown = names.filterNot(qs.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    for (q <- names) {
      val j0 = jobCounter.get()
      val t0 = System.nanoTime()
      val df = qs(q)(spark, sfDir)
      graft.Bench.force(df)
      val sec = (System.nanoTime() - t0) / 1e9
      val jobs = jobCounter.get() - j0
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val body =
        f"# $q ($suffix) — executed at $sfDir%s, $sec%.2f s (this run), $jobs jobs\n\n$plan"
      Files.write(Paths.get(outDir, s"${q}_$suffix.txt"),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(f"[plan-dump] $q%-28s $sec%6.2f s $jobs%3d jobs -> $outDir/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
