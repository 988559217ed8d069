package graft.tools

import graft.GraftSession

/** r20 optimization-round probe: per-query warm floor + Spark-job
  * count for an arbitrary list of registered queries (ProbeDrift's
  * instrumentation, generalized). Multi-job rows pay
  * jobs × per-job scheduler latency (measured 36–46 ms on this box)
  * of pure scheduling overhead on top of their actual work, so
  * jobs/run is the first number to read when deciding whether a row's
  * cost is compute or harness shape.
  *
  * {{{ sbt "runMain graft.tools.ProbeTop q_a,q_b[,...] [sfDir] [n]" }}}
  */
object ProbeTop {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(2).headOption.map(_.toInt).getOrElse(4)
    val spark = GraftSession.getOrCreate("graft-probe-top")
    spark.sparkContext.setLogLevel("WARN")
    // r21: optional session-conf overrides for A/B probes, e.g.
    // PROBE_CONF="spark.sql.streaming.stateStore.providerClass=...;k=v"
    // (probe-tool only — the driver-contract mains never read this)
    sys.env.get("PROBE_CONF").foreach(_.split(";").map(_.trim)
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        println(s"[probe-top] conf override: $k=$v")
        spark.conf.set(k, v)
      })
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    def jobMs(): Double = {
      spark.range(1).count()
      val t0 = System.nanoTime()
      var i = 0
      while (i < 50) { spark.range(1, 2, 1, 1).count(); i += 1 }
      (System.nanoTime() - t0) / 1e6 / 50.0
    }
    println(f"[probe-top] empty-job latency: ${jobMs()}%.1f ms/job")
    val jobCounter = new java.util.concurrent.atomic.AtomicLong(0)
    val stageCounter = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCounter.incrementAndGet(); ()
        }
        override def onStageSubmitted(
            st: org.apache.spark.scheduler.SparkListenerStageSubmitted)
            : Unit = {
          stageCounter.incrementAndGet(); ()
        }
      })
    val qs = graft.SparkEntry.queries
    val unknown = names.filterNot(qs.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    for (q <- names) {
      val fn = qs(q)
      var lastJobs = 0L
      var lastStages = 0L
      val runs = (1 to n).map { _ =>
        val j0 = jobCounter.get(); val s0 = stageCounter.get()
        val t0 = System.nanoTime()
        graft.Bench.force(fn(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        lastJobs = jobCounter.get() - j0
        lastStages = stageCounter.get() - s0
        sec
      }
      val floor = runs.min
      println(f"[probe-top] $q%-28s floor=$floor%6.2f s jobs/run=$lastJobs%3d stages/run=$lastStages%3d runs=" +
        runs.map(r => f"$r%.2f").mkString("[", ", ", "]"))
    }
    spark.stop()
  }
}
