package graft.tools

import graft.GraftSession
import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Planted-skew benchmark for the r16 de-skews: a 90%-one-language
  * corpus (the multilingual head these operators exist to tame)
  * drives both
  *  - [[Sampling.temperatureResample]]: salted two-stage top-k vs the
  *    legacy single stratum-keyed `row_number` window, and
  *  - [[Sampling.nucleusCut]]: value-class prefix decomposition vs
  *    the legacy per-stratum running-sum window.
  * In the legacy forms the hot stratum funnels ~0.9·n rows into ONE
  * un-splittable window partition; the de-skewed forms bound every
  * partition (stage buckets ~n/S; value classes / tie classes).
  * Prints wall times; results land in PERF.md.
  */
object ProbeHotStratum {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("probe-hotstratum")
    spark.sparkContext.setLogLevel("WARN")
    val nRows = args.headOption.map(_.toLong).getOrElse(1000000L)
    // 90% "en", the rest spread over 40 tail languages; unique order
    // key; integral masses over a realistic bounded domain (doc
    // lengths 50..8049) with heavy ties at the hot end. The tail key
    // derives from id/10 (NOT id % 40: tail ids all satisfy
    // id % 10 == 9, so id % 40 only hits {9,19,29,39} — 4 languages
    // 10x hotter than documented)
    val docs = spark.range(nRows)
      .select(col("id"),
        when(col("id") % 10 < 9, lit("en"))
          .otherwise(concat(lit("l"),
            ((col("id") / 10) % 40).cast("string")))
          .as("lang"),
        (col("id") * 2654435761L % 8000 + 50).as("mass"))
      .repartition(32)
      .persist()
    docs.count() // materialize outside the timed region

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }

    def temp(viaWindow: Boolean, salt: Int = 0): Double =
      time(graft.Bench.force(
        Sampling.temperatureResampleImpl(docs, col("lang"), col("id"),
          alpha = 0.5, saltBuckets = salt, viaWindow = viaWindow)))
    temp(viaWindow = false) // warmup
    val tFast = Seq(temp(false), temp(false)).min
    val tWin = Seq(temp(true), temp(true)).min
    println(f"[hotstratum] temperature rows=$nRows " +
      f"two_stage=$tFast%.2fs window=$tWin%.2fs " +
      f"speedup=${tWin / tFast}%.2fx")
    // the re-inflation leg: an UNCAPPED cluster-scale salt width
    // (shuffle.partitions = 65536 is routine on large clusters) makes
    // stage-1 buckets (n/S rows) smaller than k, so stage 1 keeps
    // everything and stage 2 is the full corpus-sized stratum window
    // again — the r17 min(conf, 1024) cap exists because of this leg
    val tBig = Seq(temp(false, salt = 65536),
      temp(false, salt = 65536)).min
    println(f"[hotstratum] temperature rows=$nRows " +
      f"uncapped_salt_65536=$tBig%.2fs (vs capped $tFast%.2fs: " +
      f"${tBig / tFast}%.2fx re-inflation)")

    def nuc(viaWindow: Boolean): Double = time(graft.Bench.force(
      Sampling.nucleusCutImpl(docs, col("lang"), col("mass"),
        col("id"), pct = 80, viaWindow = viaWindow)))
    nuc(viaWindow = false) // warmup
    val nFast = Seq(nuc(false), nuc(false)).min
    val nWin = Seq(nuc(true), nuc(true)).min
    println(f"[hotstratum] nucleus rows=$nRows " +
      f"value_class=$nFast%.2fs window=$nWin%.2fs " +
      f"speedup=${nWin / nFast}%.2fx")

    docs.unpersist()
    spark.stop()
  }
}
