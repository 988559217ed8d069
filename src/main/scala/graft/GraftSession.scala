package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Tuned for the driver's local[32] harness but with settings chosen to
  * survive a real multi-executor cluster at ~100 TB:
  *   - AQE on (runtime coalescing, skew-join splitting, plan re-opt)
  *   - modest static shuffle partitions for local runs; AQE raises the
  *     effective parallelism from `advisoryPartitionSizeInBytes` at scale
  *   - auto broadcast threshold left at default (10 MB) — dims (TLD list,
  *     GeoIP ranges, region/nation) broadcast automatically; we also hint
  *     explicitly at call sites.
  */
object GraftSession {
  /** The one parallelism knob: local[cpus] AND the static shuffle
    * partition count. Defaults to 32 — the driver's harness config.
    * Every main (Verify, Bench, probes) must come through here: r16
    * shipped a bench artifact silently measured at a drifted local[4]
    * because Bench carried its own builder with its own default. */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String = "graft"): SparkSession.Builder = {
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      // testdata events.ts is parquet TIMESTAMP(NANOS): read as long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.driver.host", "127.0.0.1")
  }

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sweepStaleWorkDirs()
    spark
  }

  /** Reap abandoned `graft_*` work dirs under java.io.tmpdir (r19
    * ADVICE): every staging helper in the query layer tags its dir
    * with the session's applicationId so CONCURRENT processes never
    * collide — which also means a finished session's dirs are never
    * reclaimed by the next one's entry wipe. Most families leak KB of
    * blobs, but q_stream_profile_inc stages a near-full copy of the
    * filtered events per session, so long-lived boxes accumulate
    * data-sized garbage. Swept once per session: a dir is stale when
    * neither it nor any direct child was touched for 3 h — live runs
    * write children continuously (bench sweeps ~10 min, full
    * ScaleBench ≤ 50 min), so the age gate cannot catch a concurrent
    * process's live state. */
  @volatile private var swept = false
  private def sweepStaleWorkDirs(): Unit = {
    if (swept) return
    swept = true
    val cutoff = System.currentTimeMillis() - 3L * 3600 * 1000
    def lastTouched(d: java.io.File): Long =
      (d.lastModified() +: Option(d.listFiles())
        .getOrElse(Array.empty[java.io.File]).map(_.lastModified()).toSeq).max
    Option(new java.io.File(System.getProperty("java.io.tmpdir"))
        .listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("graft_") &&
        lastTouched(f) < cutoff)
      .foreach { f =>
        try {
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).getOrElse(Array.empty[java.io.File])
              .foreach(rm)
            x.delete(); ()
          }
          rm(f)
        } catch { case _: Throwable => () }
      }
  }
}
