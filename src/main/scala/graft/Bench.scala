package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line with the total and per-query
  * seconds. The harness captures only the LAST ~2000 chars of output
  * (rounds 1-4 lost the line to its own length), so the inline
  * `queries` map is budgeted: slowest queries first, rounded to ms,
  * truncated to keep the whole line inside the capture window. The
  * complete full-precision map is written to `bench_full.json`.
  *
  * Contention-proofing (round 7): a single-shot timing is poisoned by
  * one noisy co-tenant window — round 6's driver bench recorded 14x
  * the quiet-box time on queries with zero source diff. Each query is
  * now timed multiple times and the reported figure is the min
  * (best-observed = least-contended); queries under 5 s get a third
  * run since scheduler noise dominates short timings. The output also
  * carries /proc/loadavg and JVM GC-time so a contaminated run is
  * self-identifying: loadavg >> allotted cpus, or gc_sec a large
  * fraction of wall, means the number is box noise, not the engine.
  */
object Bench {
  private def gcMillis: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }
  private def loadAvg: String =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")),
        java.nio.charset.StandardCharsets.UTF_8)
      s.split("\\s+").take(3).mkString(" ")
    } catch { case _: Throwable => "" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM/codegen/parquet-footer caches, so per-query numbers
    // reflect steady-state cost rather than first-job startup
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    val loadBefore = loadAvg
    val gcBefore = gcMillis
    val wall0 = System.nanoTime()
    // A run that THROWS must never become the reported minimum (a
    // fast failure would otherwise look like a good number): failed
    // runs time as +Infinity, so min() only ever picks a successful
    // run, and a query whose every run failed is reported as an error
    // (value -1), excluded from the total.
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => Double.PositiveInfinity }
    }
    // min-of-2, plus a third run for sub-5s queries where scheduler/JIT
    // noise dominates; min = least-contended observation of a
    // deterministic computation. ALL runs are kept: min is the
    // headline (steady-state), but the max/spread carries the pay-once
    // costs (codegen compile, staging, index build) and quantifies
    // contention per query — bench_full.json records the whole spread.
    // Local-iteration filter (mirrors Verify's VERIFY_ONLY): when
    // BENCH_ONLY=q_a,q_b is set, bench_full.json is NOT overwritten —
    // a subset total must never masquerade as the fleet number.
    val only = sys.env.get("BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results: Seq[(String, Seq[Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>
          val two = Seq(timeOnce(fn), timeOnce(fn))
          val runs = if (two.min < 5.0) two :+ timeOnce(fn) else two
          name -> runs
        }
    val best = results.map { case (name, runs) =>
      val ok = runs.filter(_.isFinite)
      name -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    val errors = best.collect { case (name, v) if v < 0 => name }
    val total = best.map(_._2).filter(_ >= 0).sum
    val wallSec = (System.nanoTime() - wall0) / 1e9
    val gcSec = (gcMillis - gcBefore) / 1e3
    val loadAfter = loadAvg
    val errField =
      if (errors.isEmpty) ""
      else errors.map(e => s""""$e"""").mkString(""","errors":[""", ",", "]")
    val health = f""""loadavg_before":"$loadBefore","loadavg_after":"$loadAfter","gc_sec":$gcSec%.1f,"wall_sec":$wallSec%.1f,"cpus":$cpus,"runs_per_query":"min-of-2 (3 if <5s)"$errField"""
    val fullJson = results.map { case (k, runs) =>
      val ok = runs.filter(_.isFinite)
      val runsJson = runs.map(r => if (r.isFinite) f"$r%.4f" else "-1")
        .mkString("[", ",", "]")
      if (ok.isEmpty) s""""$k":{"min":-1,"max":-1,"runs":$runsJson}"""
      else f""""$k":{"min":${ok.min}%.4f,"max":${ok.max}%.4f,"runs":$runsJson}"""
    }.mkString(s"""{"metric":"total","value":$total,"unit":"sec",$health,"queries":{""",
        ",", s"""},"sf":"$sfDir"}""")
    if (only.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
        fullJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // inline map: slowest first, ms precision, hard char budget
    val parts = best.sortBy(-_._2)
      .map { case (k, v) => f""""$k":$v%.3f""" }
    // health fields (~200 chars) now share the ~2000-char capture window
    val budget = 1400
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var len = 0
    var full = false
    // prefix truncation, not a greedy filter: stop at the FIRST entry
    // that does not fit, so the kept set is exactly "the slowest N"
    for (p <- parts if !full) {
      if (len + p.length + 1 <= budget) { kept += p; len += p.length + 1 }
      else full = true
    }
    // the omitted (fastest) queries' united total makes the headline
    // reconstructible from the tail alone: total = shown + omitted_sec
    val omitted = parts.size - kept.size
    val omittedSec = best.sortBy(-_._2).drop(kept.size)
      .map(_._2).filter(_ >= 0).sum
    val extra =
      if (omitted > 0)
        f""","omitted_fast_queries":$omitted,"omitted_sec":$omittedSec%.3f,"full":"bench_full.json""""
      else ""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},$health,"queries":${kept.mkString("{", ",", "}")},"sf":"$sfDir"$extra}""")
    spark.stop()
  }
}
