package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import Multimodal._

class MultimodalSpec extends SparkTestBase {

  import spark.implicits._

  lazy val media = Seq(
    MediaRecord(1L, "image", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10),
      MediaMeta(Some(4000), Some(3000), None, None)),
    MediaRecord(2L, "audio", Array[Byte](9, 9, 9),
      MediaMeta(None, None, Some(44100), Some(90000))),
    MediaRecord(3L, "video", Array.tabulate(100)(_.toByte),
      MediaMeta(Some(1920), Some(1080), Some(48000), Some(60000)))
  ).toDS()

  test("feature extraction: fixed width, deterministic, partition-safe") {
    val f1 = extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = extractFeatures(media.repartition(3)).collect().sortBy(_.media_id)
    assert(f1.length == 3)
    assert(f1.forall(_.feature.length == 8))
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq)
    assert(f1.map(_.n_bytes).toSeq == Seq(10L, 3L, 100L))
  }

  test("frame sampling explodes only video rows with timeline metadata") {
    val frames = sampleFrames(media, 4).collect().sortBy(_.frame_index)
    assert(frames.length == 4)
    assert(frames.forall(_.media_id == 3L))
    assert(frames.map(_.ts_ms).toSeq == Seq(0, 15000, 30000, 45000))
    assert(frames.map(_.frame_bytes.length).sum == 100)  // full coverage
  }

  test("resize transform scales metadata preserving aspect") {
    val resized = resizeMeta(media.toDF(), 1000)
      .select("media_id", "meta.width", "meta.height")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Int]),
        Option(r.get(2)).map(_.asInstanceOf[Int]))).sortBy(_._1)
    assert(resized(0) == ((1L, Some(1000), Some(750))))
    assert(resized(1) == ((2L, None, None)))          // audio untouched
    assert(resized(2) == ((3L, Some(1000), Some(562)))) // 1920x1080 scaled
  }

  test("raw DataFrame round-trips through the typed media schema") {
    val df = spark.createDataFrame(media.toDF().rdd, mediaSchema)
    val typed = asRecords(df).collect().sortBy(_.media_id)
    assert(typed.length == 3)
    assert(typed(1).meta.sample_rate == Some(44100))
  }
}
