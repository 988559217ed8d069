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

  // ---- real header parsing (hand-built public-format fixtures) ----

  private def hexBytes(h: String): Array[Byte] =
    h.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private def parse(b: Array[Byte]) = {
    val rows = Seq(Tuple1(b)).toDF("bytes")
      .select(mediaMeta(col("bytes")).as("m")).select("m.*").collect()
    Option(rows.head.getAs[String]("format")).map(f =>
      (f, Option(rows.head.get(1)), Option(rows.head.get(2)),
        Option(rows.head.get(3)), Option(rows.head.get(4)),
        Option(rows.head.get(5))))
  }

  test("PNG IHDR: width/height big-endian, channels from color type") {
    // 800x600, bit depth 8, color type 2 (truecolor -> 3 channels)
    val png = hexBytes(
      "89504E470D0A1A0A 0000000D 49484452 00000320 00000258 08 02 000000 AABBCCDD")
    assert(parse(png) ==
      Some(("png", Some(800), Some(600), None, Some(3), Some(8))))
    // truncated mid-IHDR -> null, not an exception
    assert(parse(png.take(20)).isEmpty)
    // wrong first chunk -> null
    assert(parse(hexBytes(
      "89504E470D0A1A0A 0000000D 58585858 00000320 00000258 08 02 000000 AABBCCDD")).isEmpty)
  }

  test("JPEG: segment scan skips APP0/DQT to the SOF marker") {
    // SOI, APP0 (JFIF, 16 bytes), SOF0 with 1024x768, 3 components
    val jpeg = hexBytes(
      "FFD8 FFE0 0010 4A46494600 0101 00 0048 0048 00 00" +
        " FFC0 0011 08 0300 0400 03 011100 021101 031101 FFD9")
    assert(parse(jpeg) ==
      Some(("jpeg", Some(1024), Some(768), None, Some(3), Some(8))))
    // progressive SOF2 is a frame marker too
    val sof2 = hexBytes("FFD8 FFC2 000B 08 0010 0020 01 011100 FFD9")
    assert(parse(sof2) ==
      Some(("jpeg", Some(32), Some(16), None, Some(1), Some(8))))
    // DHT (C4) is NOT a frame marker; EOI before any SOF -> null
    assert(parse(hexBytes("FFD8 FFC4 0004 0000 FFD9")).isEmpty)
  }

  test("WAV: chunk scan finds fmt after a leading JUNK chunk") {
    val wav = hexBytes(
      "52494646 44000000 57415645" +      // RIFF size WAVE
        " 4A554E4B 04000000 00000000" +   // JUNK chunk (4 bytes)
        " 666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000")
    assert(parse(wav) ==
      Some(("wav", None, None, Some(44100), Some(2), Some(16))))
  }

  test("GIF logical screen descriptor: little-endian u16") {
    assert(parse(hexBytes("474946383961 4001 F000 00 00 00")) ==
      Some(("gif", Some(320), Some(240), None, None, None)))
  }

  test("garbage and empty payloads parse to null") {
    assert(parse(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13)).isEmpty)
    assert(parse(Array.emptyByteArray).isEmpty)
  }

  test("fixture builders emit honest containers the parser round-trips") {
    val df = spark.range(1, 50).toDF("id")
      .select(col("id").cast("int").as("id"))
    val w = col("id") * 7 % 2000 + 1
    val h = col("id") * 13 % 1500 + 1
    val png = df.select(col("id"), mediaMeta(pngBytes(w, h)).as("m"))
      .select("id", "m.format", "m.width", "m.height").collect()
    assert(png.forall(r => r.getString(1) == "png" &&
      r.getInt(2) == r.getInt(0) * 7 % 2000 + 1 &&
      r.getInt(3) == r.getInt(0) * 13 % 1500 + 1))
    val jpg = df.select(col("id"), mediaMeta(jpegBytes(w, h)).as("m"))
      .select("id", "m.format", "m.width", "m.height").collect()
    assert(jpg.forall(r => r.getString(1) == "jpeg" &&
      r.getInt(2) == r.getInt(0) * 7 % 2000 + 1 &&
      r.getInt(3) == r.getInt(0) * 13 % 1500 + 1))
    val wav = df.select(col("id"),
        mediaMeta(wavBytes(col("id") * 100 + 8000, lit(2))).as("m"))
      .select("id", "m.format", "m.sample_rate", "m.channels").collect()
    assert(wav.forall(r => r.getString(1) == "wav" &&
      r.getInt(2) == r.getInt(0) * 100 + 8000 && r.getInt(3) == 2))
  }

  test("withParsedMeta overrides caller meta from real headers") {
    val df = Seq((10L, "image")).toDF("media_id", "kind")
      .withColumn("bytes", pngBytes(lit(123), lit(45)))
      .withColumn("meta", struct(lit(1).as("width"), lit(1).as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(777).as("duration_ms")))
    val out = withParsedMeta(df)
      .select("meta.width", "meta.height", "meta.duration_ms").collect()(0)
    assert(out.getInt(0) == 123 && out.getInt(1) == 45 &&
      out.getInt(2) == 777) // duration preserved, dims from bytes
  }
}
