package graft.tools

import graft.GraftSession

/** Focused min-of-N re-probe of the [[ScaleBench]] EXTRA rows
  * (dedup_embedding_prodcfg, multimodal_meta/features) — these run
  * single-shot in the full sweep and are skipped by SCALE_BENCH_ONLY,
  * so an outlier ratio there has no in-sweep way to separate plan cost
  * from one bad draw. Reuses an existing scaled build.
  *
  * {{{ sbt "runMain graft.tools.ProbeScaleExtras [sfDir] [scaledDir] [runs]" }}}
  */
object ProbeScaleExtras {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scaledDir = args.drop(1).headOption.getOrElse("/tmp/graft_sf1")
    val runs = args.drop(2).headOption.map(_.toInt).getOrElse(4)
    val spark = GraftSession.getOrCreate("graft-probe-scale-extras")
    spark.sparkContext.setLogLevel("WARN")
    // warmup both scan paths (the Bench discipline)
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    spark.read.parquet(s"$scaledDir/documents.parquet").count()

    def minOf(f: => Double): Double = (1 to runs).map(_ => f).min

    val eb = minOf(ScaleBench.dedupEmb(spark, sfDir)._2)
    val es = minOf(ScaleBench.dedupEmb(spark, scaledDir)._2)
    println(f"[probe-extras] dedup_embedding_prodcfg: base=$eb%.2f s " +
      f"scaled=$es%.2f s ratio=${es / eb}%.2f (min-of-$runs)")

    def media(dir: String): (Double, Double) = {
      val r = (1 to runs).map(_ => ScaleBench.mediaScale(spark, dir))
      (r.map(_._2).min, r.map(_._4).min)
    }
    val (mb, fb) = media(sfDir)
    val (ms, fs) = media(scaledDir)
    println(f"[probe-extras] multimodal_meta: base=$mb%.2f s " +
      f"scaled=$ms%.2f s ratio=${ms / mb}%.2f (min-of-$runs)")
    println(f"[probe-extras] multimodal_features: base=$fb%.2f s " +
      f"scaled=$fs%.2f s ratio=${fs / fb}%.2f (min-of-$runs)")
    spark.stop()
  }
}
