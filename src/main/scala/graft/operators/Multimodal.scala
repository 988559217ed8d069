package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * The heavy codecs are NOT in this container, so the byte-level decode
  * is a clearly-marked deterministic STUB ([[StubCodec]]) — everything
  * Spark-side (schema, partitioning, the mapPartitions batch shape, the
  * operator signatures) is real and tested, and swapping the stub for a
  * JNI/FFmpeg decoder changes no plan shape.
  *
  * Scale notes: media rows are large — the operators repartition by
  * size-aware bucketing upstream (caller policy), process
  * partition-at-a-time with an iterator (no per-row task overhead, no
  * full-partition materialization), and emit fixed-width feature
  * vectors so downstream similarity/dedup run on compact columns.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", IntegerType, nullable = true))),
      nullable = true)))

  final case class MediaMeta(width: Option[Int], height: Option[Int],
                             sample_rate: Option[Int], duration_ms: Option[Int])
  final case class MediaRecord(media_id: Long, kind: String,
                               bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String,
                                 feature: Array[Float], n_bytes: Long)
  final case class Frame(media_id: Long, frame_index: Int, ts_ms: Int,
                         frame_bytes: Array[Byte])

  /** STUB codec — deterministic fake standing in for libjpeg/ffmpeg.
    * Replace `decodeFeatures`/`sampleFrame` with real decoders; the
    * call sites and plans do not change. */
  object StubCodec {
    /** Fake 8-dim feature vector derived from a rolling byte hash. */
    def decodeFeatures(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](8)
      if (bytes != null) {
        var h = 1125899906842597L
        var i = 0
        while (i < bytes.length) {
          h = h * 31 + bytes(i)
          acc(i % 8) += (h % 1000) / 1000.0f
          i += 1
        }
      }
      acc
    }

    /** Fake frame extraction: slices of the payload at regular strides. */
    def sampleFrame(bytes: Array[Byte], idx: Int, of: Int): Array[Byte] =
      if (bytes == null || bytes.isEmpty) Array.emptyByteArray
      else {
        val span = math.max(bytes.length / of, 1)
        bytes.slice(idx * span, math.min((idx + 1) * span, bytes.length))
      }
  }

  /** Decode + feature-extract, partition-at-a-time. The iterator-in /
    * iterator-out shape is what a vectorized (Arrow/pandas-style) UDF
    * gets on a Python runtime — here it is a JVM mapPartitions. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.media_id, r.kind,
          StubCodec.decodeFeatures(r.bytes),
          if (r.bytes == null) 0L else r.bytes.length.toLong)
      }
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame. */
  def sampleFrames(media: Dataset[MediaRecord], frames: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      (0 until frames).iterator.map { i =>
        val dur = r.meta.duration_ms.getOrElse(0)
        Frame(r.media_id, i, if (frames == 0) 0 else dur * i / frames,
          StubCodec.sampleFrame(r.bytes, i, frames))
      }
    }
  }

  /** Resize metadata transform (column-level; byte transform stubbed as
    * pass-through — a real resize rewrites `bytes` in the same shape). */
  def resizeMeta(df: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val scale = when(greatest(w, h) > maxDim,
      lit(maxDim) / greatest(w, h).cast("double")).otherwise(lit(1.0))
    df.withColumn("meta", struct(
      (w * scale).cast("int").as("width"),
      (h * scale).cast("int").as("height"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.duration_ms").as("duration_ms")))
  }

  /** Typed view over a raw media DataFrame. */
  def asRecords(df: DataFrame): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.as[MediaRecord]
  }

  // ---- real header parsing (public container formats) ----

  /** Parsed container metadata from raw bytes — a codegen'd struct
    * projection over the PUBLIC header layouts (PNG IHDR, JPEG SOF,
    * GIF screen descriptor, WAV fmt chunk); NULL for unrecognized or
    * corrupt payloads. See [[graft.plans.MediaOps.parseHeader]]. */
  def mediaMeta(bytes: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    graft.plans.GraftExtensions.nativeFn("graft_media_meta", bytes)

  /** Populate the `meta` struct FROM THE BYTES, replacing any
    * caller-supplied width/height/sample_rate with the parsed header
    * values (duration is not derivable from headers alone without a
    * codec — preserved from the input struct). */
  def withParsedMeta(df: DataFrame): DataFrame = {
    val m = mediaMeta(col("bytes"))
    df.withColumn("meta", struct(
      m.getField("width").as("width"),
      m.getField("height").as("height"),
      m.getField("sample_rate").as("sample_rate"),
      col("meta.duration_ms").as("duration_ms")))
  }

  // ---- deterministic honest-format fixtures ----
  //
  // Built column-side as hex strings + one unhex: real PNG/JPEG/WAV
  // byte layouts (the parser above is exercised on genuine container
  // structure), with every varying field a closed-form function of the
  // id — so an engine without the parser (the DuckDB oracle) can
  // predict the parsed output exactly.

  private def be16hex(v: org.apache.spark.sql.Column) =
    lpad(hex(v), 4, "0")
  private def be32hex(v: org.apache.spark.sql.Column) =
    lpad(hex(v), 8, "0")
  private def le16hex(v: org.apache.spark.sql.Column) = {
    val h = lpad(hex(v), 4, "0")
    concat(substring(h, 3, 2), substring(h, 1, 2))
  }
  private def le32hex(v: org.apache.spark.sql.Column) = {
    val h = lpad(hex(v), 8, "0")
    concat(substring(h, 7, 2), substring(h, 5, 2), substring(h, 3, 2),
      substring(h, 1, 2))
  }

  /** Minimal valid-structure PNG: signature + IHDR (bit depth 8,
    * color type 6 = RGBA) + placeholder CRC. */
  def pngBytes(w: org.apache.spark.sql.Column,
               h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unhex(concat(lit("89504E470D0A1A0A"), lit("0000000D"), lit("49484452"),
      be32hex(w), be32hex(h), lit("0806000000"), lit("DEADBEEF")))

  /** Minimal JPEG: SOI + SOF0 (precision 8, 3 components) + EOI. */
  def jpegBytes(w: org.apache.spark.sql.Column,
                h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unhex(concat(lit("FFD8"), lit("FFC0"), lit("0011"), lit("08"),
      be16hex(h), be16hex(w), lit("03"), lit("011100021101031101"),
      lit("FFD9")))

  /** Minimal WAV: RIFF/WAVE + 16-byte PCM fmt chunk (16-bit). */
  def wavBytes(rate: org.apache.spark.sql.Column,
               channels: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    unhex(concat(lit("52494646"), le32hex(lit(36)), lit("57415645"),
      lit("666D7420"), le32hex(lit(16)), le16hex(lit(1)),
      le16hex(channels), le32hex(rate), le32hex(rate * lit(2)),
      le16hex(lit(2)), le16hex(lit(16))))
}
