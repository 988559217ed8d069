package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Planted-skew benchmark for scrubRepeatedSpans' keep-first stage
  * (VERDICT r14 #5): one boilerplate 6-token header repeated across
  * 10⁶ documents — every header gram occurs ~10⁶ times, so the legacy
  * `row_number` window form funnels ~10⁶ rows per gram into ONE
  * un-splittable window partition, while the default
  * `groupBy(min(struct))` + join form collapses the hot gram map-side
  * and lets AQE split the join. Prints both wall times; results land
  * in PERF.md. */
object ProbeHotGram {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("probe-hotgram")
    spark.sparkContext.setLogLevel("WARN")
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    // two plant shapes:
    //  mixed — header + unique per-doc tail: hot grams exist but the
    //          unique-gram mass dominates the shuffle either way;
    //  pure  — every doc IS the boilerplate: every gram is hot, the
    //          window form funnels the whole gram stream into a
    //          handful of un-splittable partitions while the agg form
    //          collapses it map-side.
    def mkDocs(pure: Boolean) = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        (if (pure) lit("hdr1 hdr2 hdr3 hdr4 hdr5 hdr6 hdr7 hdr8 " +
          "hdr9 hdr10 hdr11")
        else concat(lit("hdr1 hdr2 hdr3 hdr4 hdr5 hdr6 "),
          format_string("u%da u%db u%dc", col("id"), col("id"),
            col("id")))).as("text"))
      .repartition(32)
      .persist()
    for (shape <- Seq("mixed", "pure")) {
      val docs = mkDocs(shape == "pure")
      docs.count() // materialize input outside the timed region
      def run(viaWindow: Boolean): Double = {
        val t0 = System.nanoTime
        graft.Bench.force(graft.operators.Dedup.scrubRepeatedSpansImpl(
          docs, "doc_id", col("text"), k = 5, hashGrams = false,
          keepFirstViaWindow = viaWindow))
        (System.nanoTime - t0) / 1e9
      }
      // warmup, then min-of-2 each, agg-join first
      run(viaWindow = false)
      val agg = Seq(run(false), run(false)).min
      val win = Seq(run(true), run(true)).min
      println(f"[hotgram] shape=$shape docs=$nDocs agg_join=$agg%.2fs " +
        f"window=$win%.2fs speedup=${win / agg}%.2fx")
      docs.unpersist()
    }
    spark.stop()
  }
}
