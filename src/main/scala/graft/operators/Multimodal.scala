package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * Every byte path is REAL: image decode via [[ImageCodec]] (pure-JVM
  * `javax.imageio`, PNG/JPEG/GIF), audio PCM via [[AudioCodec]], and
  * video frame extraction via [[VideoCodec]] — an AVI (RIFF) container
  * walk with DIB/MJPG pixel decode, which retires the last codec stub.
  * Formats outside the JDK's reach (H.264 in MP4, ...) surface their
  * container metadata/timeline ([[mediaMeta]], [[frameTimeline]]) and
  * return null frames — swapping in an FFmpeg-class grabber widens
  * codec coverage without changing any plan shape.
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
  final case class FrameFeatures(media_id: Long, frame_index: Int,
                                 ts_ms: Int, frame_bytes_len: Int,
                                 feature: Array[Float])

  /** Decode + feature-extract, partition-at-a-time. The iterator-in /
    * iterator-out shape is what a vectorized (Arrow/pandas-style) UDF
    * gets on a Python runtime — here it is a JVM mapPartitions.
    *
    * REAL pixel decode: [[ImageCodec.decodeFeatures]] runs `javax.
    * imageio` over the payload and emits the 64-dim 8x8 mean-luminance
    * grid; payloads no JDK reader accepts (audio, video, corrupt
    * bytes) get a null feature vector, never an exception. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.media_id, r.kind,
          ImageCodec.decodeFeatures(r.bytes),
          if (r.bytes == null) 0L else r.bytes.length.toLong)
      }
    }
  }

  /** REAL frame sampling for video rows: parse the container once per
    * row — AVI ([[VideoCodec]]) or MP4 sample table ([[Mp4Codec]]) —
    * pick up to `maxFrames` evenly-spaced frames (index map
    * `j*n/maxFrames` — every frame when n <= maxFrames), and emit the
    * RAW container frame payloads with their exact clock presentation
    * times (AVI: strh scale/rate; MP4: cumulative stts deltas).
    * Unparseable video payloads yield no rows. */
  def sampleFrames(media: Dataset[MediaRecord], maxFrames: Int)
      : Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      if (maxFrames <= 0) Iterator.empty
      else {
        val avi = VideoCodec.parseAvi(r.bytes)
        val (n, tsOf, frameOf): (Int, Int => Int, Int => Array[Byte]) =
          if (avi != null) (avi.frames.length, avi.tsMs _, avi.frames.apply _)
          else {
            val m = Mp4Codec.parseMp4Video(r.bytes)
            if (m == null) (0, (_: Int) => 0, (_: Int) => null)
            else (m.samples.length, m.tsMs _, m.samples.apply _)
          }
        val picks =
          if (n <= maxFrames) 0 until n
          else (0 until maxFrames).map(j => j * n / maxFrames)
        picks.iterator.map(i => Frame(r.media_id, i, tsOf(i), frameOf(i)))
      }
    }
  }

  /** Container-dispatched frame features: RIFF/AVI first
    * ([[VideoCodec]]), then ISO-BMFF/MP4 via the full
    * stsd/stts/stsc/stsz/stco sample walk ([[Mp4Codec]]). Null when
    * neither container parses. */
  private def videoFrameFeatures(bytes: Array[Byte])
      : Array[(Int, Int, Int, Array[Float])] = {
    val avi = VideoCodec.frameFeatures(bytes)
    if (avi != null) avi else Mp4Codec.frameFeatures(bytes)
  }

  /** REAL per-frame pixel features for video rows: one container parse
    * + frame decode per row, emitting the [[ImageCodec.lumaGrid]] of
    * every decoded frame (null feature for frames whose codec the JVM
    * cannot decode). AVI and MP4 containers both decode
    * ([[videoFrameFeatures]]). No shuffle — per-row CPU in a flatMap. */
  def frameFeatures(media: Dataset[MediaRecord]): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val fs = videoFrameFeatures(r.bytes)
      if (fs == null) Iterator.empty
      else fs.iterator.map { case (i, ts, len, feat) =>
        FrameFeatures(r.media_id, i, ts, len, feat)
      }
    }
  }

  /** REAL resize: image rows whose longest side exceeds `maxDim` get
    * their BYTES resampled ([[ImageCodec.resizeBytes]]: explicit
    * integer nearest-neighbor, PNG re-encode) and their meta updated
    * to the actual post-resize dimensions (floor(d*maxDim/max), the
    * same integer rule the resampler applies). Undecodable or
    * in-bounds rows pass through untouched. */
  def resize(media: Dataset[MediaRecord], maxDim: Int)
      : Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val resized =
        if (r.kind != "image") null else ImageCodec.resizeBytes(r.bytes, maxDim)
      if (resized == null || (resized eq r.bytes)) r
      else {
        val m = math.max(r.meta.width.getOrElse(0), r.meta.height.getOrElse(0))
        r.copy(bytes = resized, meta = r.meta.copy(
          width = r.meta.width.map(w => math.max(1, w * maxDim / m)),
          height = r.meta.height.map(h => math.max(1, h * maxDim / m))))
      }
    })
  }

  /** 64-bit perceptual signature of one payload, dispatched by
    * modality — image: pixel-decoded luminance grid aHash; video:
    * per-cell luminance SUMS over all decoded frames (integer-exact,
    * scale-free under the strict-above-mean rule); audio: 64-segment
    * PCM absolute-sum envelope. Null when undecodable or an unknown
    * kind (corrupt media is data, not an error, at corpus scale). */
  private def sigOf(kind: String, bytes: Array[Byte]): java.lang.Long =
    kind match {
      case "image" =>
        val f = ImageCodec.decodeFeatures(bytes)
        if (f == null) null else java.lang.Long.valueOf(ImageCodec.aHash(f))
      case "video" =>
        val fs = videoFrameFeatures(bytes)
        if (fs == null) null
        else {
          val sums = new Array[Long](ImageCodec.FeatureDim)
          var any = false
          fs.foreach { case (_, _, _, g) =>
            if (g != null) {
              any = true
              var i = 0
              while (i < sums.length) { sums(i) += g(i).toLong; i += 1 }
            }
          }
          if (!any) null
          else java.lang.Long.valueOf(ImageCodec.aHashSums(sums))
        }
      case "audio" =>
        val s = AudioCodec.segmentSums(bytes, ImageCodec.FeatureDim)
        if (s == null) null
        else java.lang.Long.valueOf(ImageCodec.aHashSums(s))
      case _ => null
    }

  /** (id, sig) signatures of the rows of ONE modality — shared body of
    * the per-kind hash entry points. One decode per row, no shuffle. */
  private def kindHashes(media: Dataset[MediaRecord], kind: String)
      : DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val sig = if (r.kind != kind) null else sigOf(kind, r.bytes)
      if (sig == null) Iterator.empty
      else Iterator.single((r.media_id, sig.longValue))
    }).toDF("id", "sig")
  }

  /** Per-image 64-bit perceptual hashes: decode -> luminance grid ->
    * [[ImageCodec.aHash]]. Undecodable rows are dropped (null hash is
    * not a signature). One decode per row, no shuffle. */
  def imageHashes(media: Dataset[MediaRecord]): DataFrame =
    kindHashes(media, "image")

  /** Image near-dup pairs within `maxDist` Hamming distance of their
    * perceptual hashes — embedding-free visual dedup at corpus scale:
    * per-row decode+hash (no shuffle), then the pigeonhole-banded
    * signature self-join ([[Dedup.signatureNearDups]]) — only
    * (id, sig, block) rows ever shuffle, never pixels, and recall at
    * the requested distance is certain, not probabilistic. */
  def imageNearDups(media: Dataset[MediaRecord], maxDist: Int): DataFrame =
    Dedup.signatureNearDups(imageHashes(media), maxDist)

  /** Per-video 64-bit perceptual signatures: decode EVERY frame, sum
    * the luminance grids per cell (Long — integer-exact, and the
    * aHash comparison is scale-free so sums hash like means), hash
    * with the same strict-above-mean rule as images. A whole-video
    * signature, robust to re-encode and frame-rate-preserving edits;
    * videos with no decodable frames are dropped. One container parse
    * per row, no shuffle. */
  def videoHashes(media: Dataset[MediaRecord]): DataFrame =
    kindHashes(media, "video")

  /** Video near-dup pairs within `maxDist` Hamming distance of their
    * whole-video signatures — the video face of the banded signature
    * join: frames decode per-row (no shuffle), only (id, sig, block)
    * rows shuffle, recall at the distance is certain by pigeonhole. */
  def videoNearDups(media: Dataset[MediaRecord], maxDist: Int): DataFrame =
    Dedup.signatureNearDups(videoHashes(media), maxDist)

  /** Per-clip 64-bit perceptual audio signatures: decode PCM, take
    * 64 per-segment absolute-sum cells ([[AudioCodec.segmentSums]] —
    * a coarse loudness envelope, integer-exact), hash with the same
    * strict-above-mean rule as images/video. Undecodable rows are
    * dropped. One decode per row, no shuffle. */
  def audioHashes(media: Dataset[MediaRecord]): DataFrame =
    kindHashes(media, "audio")

  /** One-pass mixed-modality signatures: (id, kind, sig) for every
    * decodable row, whatever its kind — a single decode scan over a
    * heterogeneous corpus (vs three kind-filtered passes), feeding
    * [[saveSignatureIndex]] / [[screenMedia]]. */
  def mediaHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val sig = sigOf(r.kind, r.bytes)
      if (sig == null) Iterator.empty
      else Iterator.single((r.media_id, r.kind, sig.longValue))
    }).toDF("id", "kind", "sig")
  }

  /** Persist a corpus's perceptual-signature index — the pay-once
    * side of INCREMENTAL media dedup at 100 TB: decode each corpus
    * item once, keep 17 bytes/row (id, kind, sig), and every future
    * batch screens against the index ([[screenMedia]]) instead of
    * re-decoding the corpus or re-running the n² self-join. Mirrors
    * [[Dedup.saveMinhashIndex]] for text. */
  def saveSignatureIndex(sigs: DataFrame, path: String): Unit =
    sigs.select("id", "kind", "sig").write.mode("overwrite").parquet(path)

  def loadSignatureIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Screen an incoming media batch against a persisted corpus
    * signature index: (id_a = corpus id, id_b = batch id, kind,
    * hamming) pairs within `maxDist`, per modality — `kind` joins the
    * banded key ([[Dedup.crossSignatureNearDups]] extraKeys), so an
    * image never pairs with an audio clip that happens to collide in
    * signature space. The batch decodes once (no corpus re-decode);
    * only (id, kind, sig, block) rows shuffle; pigeonhole banding
    * makes recall at the distance certain, so the output is a
    * deterministic function of index + batch. */
  def screenMedia(batch: Dataset[MediaRecord], index: DataFrame,
                  maxDist: Int): DataFrame =
    Dedup.crossSignatureNearDups(index, mediaHashes(batch), maxDist,
      extraKeys = Seq("kind"))

  /** [[screenMedia]] through the multi-index-hashing candidate path
    * ([[Dedup.crossSignatureNearDupsMih]]) — same exact pair set
    * (both are certain-recall), sparser buckets: 16-bit substring
    * keys instead of the banded ~(64/(maxDist+1))-bit blocks, with
    * the probe expansion paid by the small batch, never the corpus
    * index. Prefer this for screening at perceptual-hash distances
    * (maxDist ~8-10) over corpus-scale indexes. */
  def screenMediaMih(batch: Dataset[MediaRecord], index: DataFrame,
                     maxDist: Int, m: Int = 4): DataFrame =
    Dedup.crossSignatureNearDupsMih(index, mediaHashes(batch), maxDist,
      extraKeys = Seq("kind"), m = m)

  /** Audio near-dup pairs within `maxDist` Hamming distance of their
    * envelope signatures — completes the modality set (text simhash,
    * image aHash, video frame-sum, audio envelope) over ONE banded
    * signature join: [[Dedup.signatureNearDups]], certain recall,
    * only (id, sig, block) rows on the shuffle. */
  def audioNearDups(media: Dataset[MediaRecord], maxDist: Int): DataFrame =
    Dedup.signatureNearDups(audioHashes(media), maxDist)

  /** Per-clip spectral landmark fingerprints (id, fp array<long>) —
    * [[SpectralCodec.fingerprint]] per row, no shuffle; undecodable
    * or sub-window clips are dropped. */
  def audioFingerprints(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val fp = if (r.kind != "audio") null
        else SpectralCodec.fingerprint(r.bytes)
      if (fp == null) Iterator.empty
      else Iterator.single((r.media_id, fp))
    }).toDF("id", "fp")
  }

  /** TIME-SHIFT-ROBUST audio near-dup: pairs whose constellation hash
    * sets overlap with Jaccard >= `threshold`. Candidates come from an
    * inverted hash index (explode -> equi-join on the hash — a pair
    * is a candidate iff it SHARES a landmark, so recall at any
    * threshold > 0 is certain), then the exact set Jaccard verifies
    * via codegen'd array_intersect/array_union. Only (id, hash) rows
    * and the candidate pairs' fingerprint arrays shuffle — never PCM.
    * Landmark selectivity (bin-pair + delta keys, ~2^24 values) keeps
    * the inverted buckets sparse at corpus scale (Wang, ISMIR 2003). */
  def audioFingerprintNearDups(media: Dataset[MediaRecord],
                               threshold: Double): DataFrame =
    fingerprintOverlapPairs(audioFingerprints(media), threshold)

  /** Set-overlap near-dup over ANY (id, fp: array<_>) fingerprint
    * frame — the shared tail of the audio landmark and video temporal
    * paths: candidates from an inverted element index (explode ->
    * equi-join — a pair is a candidate iff it SHARES an element, so
    * recall at any threshold > 0 is certain), exact set Jaccard on
    * the candidates via codegen'd array_intersect/array_union. Only
    * (id, element) rows and candidate pairs' arrays shuffle. */
  private def fingerprintOverlapPairs(fps: DataFrame,
                                      threshold: Double): DataFrame = {
    val inv = fps.select(col("id"), explode(col("fp")).as("h"))
    val cands = inv.as("a").hint("shuffle_hash")
      .join(inv.as("b").hint("shuffle_hash"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    cands
      .join(fps.select(col("id").as("id_a"), col("fp").as("fp_a")), "id_a")
      .join(fps.select(col("id").as("id_b"), col("fp").as("fp_b")), "id_b")
      .withColumn("overlap",
        size(array_intersect(col("fp_a"), col("fp_b"))).cast("double") /
          size(array_union(col("fp_a"), col("fp_b"))))
      .filter(col("overlap") >= threshold)
      .select("id_a", "id_b", "overlap")
  }

  /** A temporal landmark: frame-hash pair at relative frame distance
    * dt — bin identities and RELATIVE position only, so whole-frame
    * shifts (prepended intros, re-muxed leaders) preserve the body's
    * landmarks, unlike the whole-video SUM signature
    * ([[videoHashes]]) which any prepended frame rewrites. */
  final case class TemporalLandmark(a: Long, b: Long, dt: Int)

  /** Per-video temporal fingerprints: decode every frame, aHash each
    * ([[ImageCodec.aHash]] on the luminance grid), then the DISTINCT
    * (hash_i, hash_j, j - i) triples for 1 <= j - i <= maxDt — the
    * video face of [[SpectralCodec]]'s constellation idea, with
    * frame-level perceptual hashes as the "peaks". One container
    * parse per row, no shuffle. */
  def videoTemporalFingerprints(media: Dataset[MediaRecord],
                                maxDt: Int = 4): Dataset[(Long, Seq[TemporalLandmark])] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val fs = if (r.kind != "video") null else videoFrameFeatures(r.bytes)
      if (fs == null) Iterator.empty
      else {
        val hs = fs.flatMap { case (_, _, _, g) =>
          if (g == null) None else Some(ImageCodec.aHash(g))
        }
        if (hs.isEmpty) Iterator.empty
        else {
          val lm = scala.collection.mutable.LinkedHashSet.empty[TemporalLandmark]
          var i = 0
          while (i < hs.length) {
            var j = i + 1
            while (j < hs.length && j - i <= maxDt) {
              lm += TemporalLandmark(hs(i), hs(j), j - i)
              j += 1
            }
            i += 1
          }
          if (lm.isEmpty) Iterator.empty
          else Iterator.single((r.media_id, lm.toSeq))
        }
      }
    })
  }

  /** SHIFT-ROBUST video near-dup: pairs whose temporal landmark sets
    * overlap with Jaccard >= `threshold` — same inverted-index +
    * exact-verify tail as the audio landmarks
    * ([[fingerprintOverlapPairs]]). */
  def videoTemporalNearDups(media: Dataset[MediaRecord],
                            threshold: Double, maxDt: Int = 4): DataFrame =
    fingerprintOverlapPairs(
      videoTemporalFingerprints(media, maxDt).toDF("id", "fp"), threshold)

  /** Metadata-only resize PLANNING transform (column-level, no byte
    * touch) — predicts what [[resize]] will do to the dims, for
    * planning/stats passes that must not pay decode cost. Integer
    * floor semantics match [[ImageCodec.resizeBytes]] exactly. */
  def resizeMeta(df: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val m = greatest(w, h)
    val scaled = m > maxDim
    df.withColumn("meta", struct(
      when(scaled, greatest(lit(1), floor(w * maxDim / m).cast("int")))
        .otherwise(w).as("width"),
      when(scaled, greatest(lit(1), floor(h * maxDim / m).cast("int")))
        .otherwise(h).as("height"),
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
    * values (duration comes from the container when the format carries
    * one — MP4 mvhd — and falls back to the input struct otherwise:
    * PNG/JPEG/GIF/WAV headers alone don't determine it). */
  def withParsedMeta(df: DataFrame): DataFrame = {
    val m = mediaMeta(col("bytes"))
    df.withColumn("meta", struct(
      m.getField("width").as("width"),
      m.getField("height").as("height"),
      m.getField("sample_rate").as("sample_rate"),
      coalesce(m.getField("duration_ms"), col("meta.duration_ms"))
        .as("duration_ms")))
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

  /** Minimal WAV: RIFF/WAVE + 16-byte PCM fmt chunk (16-bit). Header
    * fields are spec-consistent for a fmt-only file: RIFF size 28
    * (= 4 "WAVE" + 8 fmt header + 16 fmt payload), byte rate
    * rate*2*channels, block align 2*channels. */
  def wavBytes(rate: org.apache.spark.sql.Column,
               channels: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    unhex(concat(lit("52494646"), le32hex(lit(28)), lit("57415645"),
      lit("666D7420"), le32hex(lit(16)), le16hex(lit(1)),
      le16hex(channels), le32hex(rate),
      le32hex(rate * lit(2) * channels),
      le16hex(lit(2) * channels), le16hex(lit(16))))

  /** A COMPLETE honest WAV: RIFF/WAVE + PCM fmt chunk (mono, 16-bit)
    * + a data chunk of 64 real little-endian samples, each the
    * closed-form function `s_j = ((id*37 + j*101) % 4096) - 2048` of
    * the row id — so the [[AudioCodec]] PCM decode output (segment
    * absolute sums, zero crossings) is predictable by an engine that
    * never touches the bytes. */
  def wavBytesWithData(rate: org.apache.spark.sql.Column,
                       id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val sampleHex = array_join(
      transform(sequence(lit(0), lit(63)), j =>
        le16hex(pmod( // 16-bit two's complement of the signed sample
          pmod(id * lit(37) + j * lit(101), lit(4096)) - lit(2048),
          lit(65536)))), "")
    unhex(concat(
      lit("52494646"), le32hex(lit(164)), lit("57415645"),
      lit("666D7420"), le32hex(lit(16)), le16hex(lit(1)), le16hex(lit(1)),
      le32hex(rate), le32hex(rate * lit(2)), le16hex(lit(2)),
      le16hex(lit(16)),
      lit("64617461"), le32hex(lit(128)), sampleHex))
  }

  /** Minimal honest MP4 (ISO-BMFF): `ftyp` + `moov{ mvhd(v0), trak{
    * tkhd(v0) } }` with box sizes exactly matching content, identity
    * matrices, and width/height in tkhd's published 16.16 fixed-point
    * layout. Duration is carried as (timescale, duration-in-units) so
    * the parser's `duration*1000/timescale` millisecond conversion is
    * exercised for real. */
  def mp4Bytes(w: org.apache.spark.sql.Column,
               h: org.apache.spark.sql.Column,
               timescale: org.apache.spark.sql.Column,
               duration: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    unhex(concat(
      lit("00000010" + "66747970" + "69736F6D" + "00000000"), // ftyp
      lit("000000D8" + "6D6F6F76"),                           // moov(216)
      mvhdHex(timescale, duration),
      lit("00000064" + "7472616B"),                           // trak(100)
      tkhdHex(w, h, duration)))

  private val matrixHex = "00010000" + "00000000" * 3 + "00010000" +
    "00000000" * 3 + "40000000" // identity, 16.16 / 2.30 fixed point

  private def mvhdHex(timescale: org.apache.spark.sql.Column,
                      duration: org.apache.spark.sql.Column) =
    concat(lit("0000006C" + "6D766864" + "00000000" +
        "00000000" + "00000000"),               // v0, ctime, mtime
      be32hex(timescale), be32hex(duration),
      lit("00010000" + "0100" + "00" * 10 + matrixHex + "00" * 24 +
        "00000002"))                            // rate, volume, next track

  private def tkhdHex(w: org.apache.spark.sql.Column,
                      h: org.apache.spark.sql.Column,
                      duration: org.apache.spark.sql.Column) =
    concat(lit("0000005C" + "746B6864" + "00000007" +
        "00000000" + "00000000" + "00000001" + "00000000"), // track 1
      be32hex(duration),
      lit("00" * 8 + "0000" + "0000" + "0000" + "0000" + matrixHex),
      be32hex(w * lit(65536)), be32hex(h * lit(65536)))     // 16.16

  /** Honest MP4 WITH a sample table: the trak carries a full
    * `mdia{ mdhd, minf{ stbl{ stts } } }` ladder whose two
    * (sample_count, sample_delta) runs are closed-form functions of
    * the fixture parameters; the media timescale is 1000 so stts
    * deltas are milliseconds and [[frameTimeline]]'s cumulative-sum
    * output is exactly predictable. Movie-level duration in mvhd is
    * kept consistent (n1*d1 + n2*d2). */
  def mp4BytesWithTimeline(w: org.apache.spark.sql.Column,
                           h: org.apache.spark.sql.Column,
                           n1: org.apache.spark.sql.Column,
                           d1: org.apache.spark.sql.Column,
                           n2: org.apache.spark.sql.Column,
                           d2: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val duration = n1 * d1 + n2 * d2 // media timescale 1000 = ms
    val stts = concat(
      lit("00000020" + "73747473" + "00000000" + "00000002"),
      be32hex(n1), be32hex(d1), be32hex(n2), be32hex(d2))
    val mdhd = concat(
      lit("00000020" + "6D646864" + "00000000" + "00000000" + "00000000"),
      be32hex(lit(1000)), be32hex(duration), lit("0000" + "0000"))
    val mdia = concat(lit("00000058" + "6D646961"), mdhd,
      lit("00000030" + "6D696E66" + "00000028" + "7374626C"), stts)
    unhex(concat(
      lit("00000010" + "66747970" + "69736F6D" + "00000000"), // ftyp
      lit("00000130" + "6D6F6F76"),                           // moov(304)
      mvhdHex(lit(1000), duration),
      lit("000000BC" + "7472616B"),                           // trak(188)
      tkhdHex(w, h, duration),
      mdia))
  }

  /** REAL per-frame presentation times (ms) from the MP4 sample table
    * — `graft_mp4_timeline` ([[graft.plans.MediaOps.mp4SampleTimesMs]]):
    * mdhd timescale + stts delta runs, cumulative. NULL for non-MP4
    * payloads. Frame PIXELS decode through [[Mp4Codec]]'s full
    * stsd/stts/stsc/stsz/stco sample walk for `'raw '` (lossless,
    * oracle-gated) and `'jpeg'` (MJPEG, ImageIO, spec tolerance)
    * sample codecs; `avc1`/`hvc1` remain the PERMANENT pure-JVM
    * boundary (no JDK inter-frame codec) — their timelines/sizes
    * parse, their pixels are null. */
  def frameTimeline(bytes: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    graft.plans.GraftExtensions.nativeFn("graft_mp4_timeline", bytes)
}
