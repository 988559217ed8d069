package graft.tools

import graft.GraftSession

/** r19→r20 drift adjudication probe (VERDICT r19 "what's wrong" #2):
  * q_graph_kcore / q_graph_hits / q_graph_components_inc /
  * q_bpe_encode_docs rose 1.33–1.41× between the r18 and r19
  * canonicals at untouched operator code, identical plan
  * fingerprints, and nil per-run gc. Hypotheses: (a) the
  * ReservedCodeCacheSize=512m change (A/B'd by full sweeps with
  * SPARK_CODECACHE), (b) the pre-sweep calibration warm, (c) pure
  * warm-up sensitivity — these are ITERATIVE rows (tens of Spark jobs
  * per run) whose bench vectors still descend at run 3, so a min-of-3
  * samples a point on a JIT curve whose early shape moves with the
  * sweep around it.
  *
  * This probe measures the part a sweep cannot: the WARM FLOOR. Each
  * row runs `n` times (default 10) in one JVM; if the late-run floor
  * sits at the r18 canonical values, the operators are unchanged and
  * the canonical-to-canonical delta is sampling position on the warm
  * curve, not a regression.
  *
  * {{{ sbt "runMain graft.tools.ProbeDrift [sfDir] [n]" }}}
  */
object ProbeDrift {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.getOrCreate("graft-probe-drift")
    spark.sparkContext.setLogLevel("WARN")
    // the bench's warmup
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // per-JOB scheduling overhead: kcore/hits run tens of tiny Spark
    // jobs per query, so a per-job latency shift moves them while
    // leaving scan-bound rows (and both existing yardsticks — the
    // register-bound CPU calib and the single-thread bandwidth pass)
    // untouched. 100 empty 1-partition jobs, reported as ms/job.
    def jobsOverheadMs(): Double = {
      spark.range(1).count() // path warm
      val t0 = System.nanoTime()
      var i = 0
      while (i < 100) { spark.range(1, 2, 1, 1).count(); i += 1 }
      (System.nanoTime() - t0) / 1e6 / 100.0
    }
    println(f"[probe-drift] empty-job latency: ${jobsOverheadMs()}%.2f ms/job " +
      f"(second sample ${jobsOverheadMs()}%.2f)")
    // count the Spark jobs a single run launches: multi-job rows pay
    // jobs × per-job latency of pure scheduling overhead, which
    // decomposes the drift row by row
    val jobCounter = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCounter.incrementAndGet(); ()
        }
      })
    val qs = graft.SparkEntry.queries
    for (q <- Seq("q_bpe_encode_docs", "q_graph_components_inc",
        "q_graph_hits", "q_graph_kcore")) {
      val fn = qs(q)
      var lastJobs = 0L
      val runs = (1 to n).map { _ =>
        val j0 = jobCounter.get()
        val t0 = System.nanoTime()
        graft.Bench.force(fn(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        lastJobs = jobCounter.get() - j0
        sec
      }
      val floor = runs.takeRight(math.max(1, n / 3)).min
      println(f"[probe-drift] $q%-24s floor=$floor%5.2f s  jobs/run=$lastJobs%3d  runs=" +
        runs.map(r => f"$r%.2f").mkString("[", ", ", "]"))
    }
    spark.stop()
  }
}
