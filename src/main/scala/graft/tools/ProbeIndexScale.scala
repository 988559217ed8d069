package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{BloomIndex, BloomJoin, CmsIndex, QuantileIndex, SketchOps}

/** The persisted-index contract, measured instead of argued: a
  * cross-day profile served from saved blobs must cost BLOB-COUNT
  * work while the rescan it replaces costs EVENT-HISTORY work.
  *
  * Planted history: D daily batches of `perDay` rows each (terms from
  * a deterministic 100k-key stream for CMS; user ids over a 3M space
  * for HLL), day 0 saved as the base index, days 1..D-1 appended as
  * `delta_<day>`. For each D the probe times
  *   - load: merge the D saved blobs + serve the profile
  *     (candidate estimates for CMS, per-segment estimates for HLL);
  *   - rescan: the same profile from a fresh single-pass sketch over
  *     all D days of raw history (what a system without the index
  *     must do);
  *   - compact (r18 verdict #4): fold the D batches into a fresh
  *     one-batch index (copy-on-write), plus the post-compaction
  *     load — compaction should cost ~one load + one blob write
  *     (blob-count work, NEVER an event scan), and the compacted
  *     load is the D-independent floor the next year's appends
  *     build on.
  * Load should stay ~flat in D (blobs are KB-sized); rescan must grow
  * ~linearly. The append cost itself is per-batch work either way and
  * is reported for completeness.
  *
  * {{{ sbt "runMain graft.tools.ProbeIndexScale [perDay] [daysCsv]" }}}
  */
object ProbeIndexScale {

  /** One synthetic banked day — shared with ScaleBench's compaction
    * regression row so both harnesses measure the same shape. */
  def plantedDay(spark: SparkSession, perDay: Long, d: Int): DataFrame =
    spark.range(d * perDay, (d + 1) * perDay)
      .select(
        concat(lit("t"), pmod(col("id") * 2654435761L, lit(100000L)))
          .as("term"),
        pmod(col("id") * 40503L, lit(3000000L)).as("uid"),
        pmod(col("id"), lit(8L)).cast("string").as("seg"),
        // heavy-tailed value stream for the quantile-sketch member —
        // pinning NO range is its whole point, so give it one a
        // HistIndex bin spec could not anticipate
        (pmod(col("id") * 69621L, lit(1000000L)).cast("double") *
          pmod(col("id") * 69621L, lit(1000000L)).cast("double") /
          lit(1e4)).as("v"))

  /** Build base + (days-1) deltas for the four blob families under
    * `base`; returns (cmsPath, hllPath, bloomPath, quantPath). */
  def buildIndexes(spark: SparkSession, base: String, perDay: Long,
                   days: Int): (String, String, String, String) = {
    val cmsPath = s"$base/cms"
    val hllPath = s"$base/hll"
    val bloomPath = s"$base/bloom"
    val quantPath = s"$base/quant"
    def day(d: Int) = plantedDay(spark, perDay, d)
    CmsIndex.saveCmsIndex(day(0), col("term"), cmsPath)
    SketchOps.saveSketchIndex(day(0), col("seg"), col("uid"), hllPath)
    BloomIndex.saveBloomIndex(day(0), col("uid"), bloomPath,
      expectedItems = 3000000L)
    QuantileIndex.saveQuantileIndex(day(0), col("v"), quantPath)
    for (d <- 1 until days) {
      CmsIndex.appendCmsIndex(spark, cmsPath, day(d), col("term"), s"d$d")
      SketchOps.appendSketchIndex(spark, hllPath, day(d),
        col("seg"), col("uid"), s"d$d")
      BloomIndex.appendBloomIndex(spark, bloomPath, day(d),
        col("uid"), s"d$d")
      QuantileIndex.appendQuantileIndex(spark, quantPath, day(d),
        col("v"), s"d$d")
    }
    (cmsPath, hllPath, bloomPath, quantPath)
  }

  def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Compact-at-D + post-compaction-load timings for one exact (CMS)
    * and one idempotent (Bloom) family, against already-built index
    * paths. Returns labeled seconds. */
  def compactionTimings(spark: SparkSession, cmsPath: String,
                        bloomPath: String, scratch: String)
      : Seq[(String, Double)] = {
    val todayKeys = spark.range(1000000)
      .select(pmod(col("id") * 48271L, lit(3000000L)).as("uid"))
    val tCompactCms = time {
      CmsIndex.compactCmsIndex(spark, cmsPath, s"$scratch/cms_compact")
    }
    val tLoadCmsPost = time {
      val (sk, _) = CmsIndex.loadMergedSketch(spark, s"$scratch/cms_compact")
      CmsIndex.estimateTerms(
          CmsIndex.loadCandidates(spark, s"$scratch/cms_compact"), sk)
        .write.format("noop").mode("overwrite").save()
    }
    val tCompactBloom = time {
      BloomIndex.compactBloomIndex(spark, bloomPath,
        s"$scratch/bloom_compact")
    }
    val tLoadBloomPost = time {
      val (blob, _) =
        BloomIndex.loadMergedFilter(spark, s"$scratch/bloom_compact")
      todayKeys.filter(!BloomJoin.mightContain(blob, col("uid")))
        .write.format("noop").mode("overwrite").save()
    }
    Seq("compact_cms" -> tCompactCms, "load_cms_post" -> tLoadCmsPost,
      "compact_bloom" -> tCompactBloom,
      "load_bloom_post" -> tLoadBloomPost)
  }

  /** Compact + post-compaction quantile read for the seventh family. */
  def quantCompactionTimings(spark: SparkSession, quantPath: String,
                             scratch: String): Seq[(String, Double)] = {
    val tCompact = time {
      QuantileIndex.compactQuantileIndex(spark, quantPath,
        s"$scratch/quant_compact")
    }
    val tLoadPost = time {
      QuantileIndex.quantiles(spark, s"$scratch/quant_compact",
          Seq(0.5, 0.95, 0.99))
        .write.format("noop").mode("overwrite").save()
    }
    Seq("compact_quant" -> tCompact, "load_quant_post" -> tLoadPost)
  }

  def main(args: Array[String]): Unit = {
    val perDay = args.headOption.map(_.toLong).getOrElse(2000000L)
    val daysList = args.drop(1).headOption.getOrElse("2,8,32")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.getOrCreate("graft-probe-index-scale")
    spark.sparkContext.setLogLevel("WARN")

    def day(d: Int) = plantedDay(spark, perDay, d)

    println(f"[probe-index] perDay=$perDay rows; days tiers: " +
      daysList.mkString(","))
    for (days <- daysList) {
      val base = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_idxscale_${days}_${System.nanoTime()}").toString
      var paths: (String, String, String, String) = null
      val tAppend = time {
        paths = buildIndexes(spark, base, perDay, days)
      }
      val (cmsPath, hllPath, bloomPath, quantPath) = paths
      val tLoadCms = time {
        val (sk, _) = CmsIndex.loadMergedSketch(spark, cmsPath)
        CmsIndex.estimateTerms(CmsIndex.loadCandidates(spark, cmsPath), sk)
          .write.format("noop").mode("overwrite").save()
      }
      val tLoadHll = time {
        SketchOps.loadSketchIndex(spark, hllPath)
          .select(col("seg"), SketchOps.estimate(col("sk")))
          .write.format("noop").mode("overwrite").save()
      }
      // membership: probe a fixed "today" batch against the loaded
      // blob (broadcast-literal codegen probe) vs the anti-join
      // against raw history a system without the index must run
      val todayKeys = spark.range(1000000)
        .select(pmod(col("id") * 48271L, lit(3000000L)).as("uid"))
      val tLoadBloom = time {
        val (blob, _) = BloomIndex.loadMergedFilter(spark, bloomPath)
        todayKeys.filter(!BloomJoin.mightContain(blob, col("uid")))
          .write.format("noop").mode("overwrite").save()
      }
      val tLoadQuant = time {
        QuantileIndex.quantiles(spark, quantPath, Seq(0.5, 0.95, 0.99))
          .write.format("noop").mode("overwrite").save()
      }
      val hist = (0 until days).map(day).reduce(_ unionAll _)
      val tRescanCms = time {
        CmsIndex.saveCmsIndex(hist, col("term"), s"$base/cms_fresh")
      }
      // what a system without the saved blobs must do: one fresh
      // distributed sketch pass over ALL history
      val tRescanQuant = time {
        QuantileIndex.saveQuantileIndex(hist, col("v"), s"$base/quant_fresh")
      }
      val tRescanHll = time {
        SketchOps.segmentSketches(hist, col("seg"), col("uid"))
          .select(col("seg"), SketchOps.estimate(col("sk")))
          .write.format("noop").mode("overwrite").save()
      }
      val tRescanBloom = time {
        todayKeys.join(hist.select(col("uid")), Seq("uid"), "left_anti")
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[probe-index] D=$days%3d (${days * perDay / 1000000}%4d M rows)" +
        f"  load: cms=$tLoadCms%6.2f s hll=$tLoadHll%6.2f s bloom=$tLoadBloom%6.2f s quant=$tLoadQuant%6.2f s" +
        f"  rescan: cms=$tRescanCms%6.2f s hll=$tRescanHll%6.2f s bloom-anti=$tRescanBloom%6.2f s quant=$tRescanQuant%6.2f s" +
        f"  (append total $tAppend%.1f s)")
      val ct = (compactionTimings(spark, cmsPath, bloomPath, base) ++
        quantCompactionTimings(spark, quantPath, base)).toMap
      println(f"[probe-index] D=$days%3d  compact: " +
        f"cms=${ct("compact_cms")}%6.2f s bloom=${ct("compact_bloom")}%6.2f s " +
        f"quant=${ct("compact_quant")}%6.2f s" +
        f"  post-compact load: cms=${ct("load_cms_post")}%6.2f s " +
        f"bloom=${ct("load_bloom_post")}%6.2f s " +
        f"quant=${ct("load_quant_post")}%6.2f s")
    }
    spark.stop()
  }
}
