package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.operators.{BloomIndex, CmsIndex, HistIndex, SketchOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Correctness burden for the streamed index-banking face
  * ([[ProfileStream]]): after two files flow through the REAL
  * checkpointed stream — with a restart between them — every index
  * must equal a FRESH single-pass build of the full input at its
  * family's strongest gate:
  *  - Bloom: merged blob BYTE-EQUAL (OR is order/batching-invariant);
  *  - HLL: per-segment composite estimates EQUAL (register-state
  *    union is batching-invariant, the estimator is pure);
  *  - CMS: merged blob BYTE-EQUAL (counter addition commutes);
  *  - Hist: (bin, cnt) rows EXACTLY equal.
  * Plus the at-least-once story: re-banking one batch under its own
  * tag leaves all four indexes unchanged. Day-zero init uses EMPTY
  * bases — also part of the contract. */
class ProfileStreamSpec extends SparkTestBase {

  import spark.implicits._

  private def base: String = {
    val d = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_profilestream_spec_${System.nanoTime()}").toString
    Files.createDirectories(Paths.get(s"$d/in"))
    d
  }

  // (k LONG, seg STRING, v DOUBLE): keys overlap across the two files
  private def rows(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(
      (col("id") % 500).as("k"),
      concat(lit("s"), col("id") % 3).as("seg"),
      (col("id") % 1000).cast("double").as("v"))

  private def addFile(d: String, df: DataFrame, name: String): Unit = {
    val tmp = s"$d/stage_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, Paths.get(s"$d/in/$name"))
    ()
  }

  private def initIndexes(d: String): (String, String, String, String) = {
    val empty = rows(0, 0)
    val (bp, hp, cp, tp) = (s"$d/bloom", s"$d/hll", s"$d/cms", s"$d/hist")
    BloomIndex.saveBloomIndex(empty, $"k", bp, expectedItems = 50000L)
    SketchOps.saveSketchIndex(empty, $"seg", $"k", hp)
    CmsIndex.saveCmsIndex(empty, $"seg", cp)
    HistIndex.saveHistIndex(empty, $"v", tp,
      lo = 0.0, width = 100.0, nBins = 10)
    (bp, hp, cp, tp)
  }

  private def assertAllEqualFresh(d: String, bp: String, hp: String,
                                  cp: String, tp: String,
                                  all: DataFrame): Unit = {
    // Bloom: byte-identity vs a fresh one-pass filter
    val (inc, _) = BloomIndex.loadMergedFilter(spark, bp)
    BloomIndex.saveBloomIndex(all, $"k", s"$d/bloom_fresh",
      expectedItems = 50000L)
    val (fr, _) = BloomIndex.loadMergedFilter(spark, s"$d/bloom_fresh")
    assert(java.util.Arrays.equals(inc, fr), "bloom blob must be " +
      "byte-equal to a fresh single-pass filter")
    // HLL: per-segment composite estimates equal a direct sketch
    val est = SketchOps.loadSketchIndex(spark, hp)
      .select($"seg", SketchOps.estimate($"sk").as("e"))
      .as[(String, Long)].collect().toMap
    val fresh = SketchOps.segmentSketches(all, $"seg", $"k")
      .select($"seg", SketchOps.estimate($"sk").as("e"))
      .as[(String, Long)].collect().toMap
    assert(est === fresh, "hll estimates must equal a direct sketch")
    // CMS: byte-identity vs a fresh one-pass sketch
    val (ci, cn) = CmsIndex.loadMergedSketch(spark, cp)
    CmsIndex.saveCmsIndex(all.select($"seg"), $"seg", s"$d/cms_fresh")
    val (cf, cfn) = CmsIndex.loadMergedSketch(spark, s"$d/cms_fresh")
    assert(cn === cfn)
    assert(java.util.Arrays.equals(ci, cf), "cms blob must be " +
      "byte-equal to a fresh single-pass sketch")
    // Hist: exact row equality with the closed-form histogram
    val hist = HistIndex.loadHistogram(spark, tp)
      .as[(Long, Long)].collect().toMap
    val direct = all
      .groupBy(HistIndex.bin($"v", 0.0, 100.0, 10).as("b"))
      .agg(count(lit(1)).as("c")).as[(Long, Long)].collect().toMap
    assert(hist === direct)
  }

  test("two files through the checkpointed stream with a restart: all " +
      "four indexes equal fresh single-pass builds at their strongest " +
      "gates (empty day-zero bases included)") {
    val d = base
    val (bp, hp, cp, tp) = initIndexes(d)
    def bank(): Unit =
      ProfileStream.bankStream(
        spark.readStream.schema("k LONG, seg STRING, v DOUBLE")
          .parquet(s"$d/in"),
        "k", "seg", "v", bp, hp, cp, tp, s"$d/ckpt")
        .awaitTermination()
    addFile(d, rows(0, 700), "f1.parquet")
    bank()
    addFile(d, rows(400, 1200), "f2.parquet")
    bank() // restart: checkpoint resumes, only f2 banks
    assertAllEqualFresh(d, bp, hp, cp, tp, rows(0, 700)
      .unionAll(rows(400, 1200)))
  }

  test("re-banking a batch under its own tag (the at-least-once " +
      "replay) leaves every index unchanged") {
    val d = base
    val (bp, hp, cp, tp) = initIndexes(d)
    val b0 = rows(0, 700)
    ProfileStream.bankBatch(b0, "k", "seg", "v", bp, hp, cp, tp, "b0")
    ProfileStream.bankBatch(b0, "k", "seg", "v", bp, hp, cp, tp, "b0")
    assertAllEqualFresh(d, bp, hp, cp, tp, b0)
  }
}
