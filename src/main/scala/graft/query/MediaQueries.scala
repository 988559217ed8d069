package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal (binary-column) query family over `documents` — split
  * out of TextQueries once the media surface grew real codecs (header
  * parse, image pixels, audio PCM, video frames, resize). Same oracle
  * discipline as the rest of the engine: fixtures are REAL container
  * bytes built in the executors with every varying field a closed-form
  * function of the row id, decoded BACK by the real parsers/codecs,
  * and the DuckDB oracle recomputes the expected output from the
  * formulas without ever touching bytes (generator ∘ parser =
  * identity on honest containers; lossless codecs round-trip
  * bit-exactly). Lossy decoders (JPEG, MJPG) run the same code paths
  * under spec tolerance in MultimodalSpec/VideoCodecSpec instead. */
object MediaQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** REAL pixel decode under the hash gate. Image rows carry genuine
    * PNGs — encoded by the JDK's ImageIO writer in the executors, then
    * decoded BACK pixel-by-pixel by [[graft.operators.ImageCodec]]
    * (8x8 mean-luminance grid, lum = 299r+587g+114b) — with every
    * pixel a closed-form function of the id: doc_id%3==1 rows are
    * solid-color1 PNGs, %3==2 rows split color1 (top half) / color2
    * (bottom) GIFs — two distinct real decoders under one gate (GIF
    * palettizes losslessly at <=2 colors). Dimensions are multiples of
    * 8 so grid cells are uniform blocks and the cell means are exact
    * integers the DuckDB oracle recomputes WITHOUT decoding
    * (encoder ∘ decoder = identity on lossless codecs).
    *
    * Video rows (%3==0) carry REAL AVI containers
    * ([[graft.operators.VideoCodec.encodeAvi]], DIB frames) — their
    * feature vector is null through [[graft.operators.Multimodal
    * .extractFeatures]] (an AVI is not a still image; per-frame pixels
    * are gated by q_multimodal_frames), while `payload_bytes` checks
    * the container size arithmetic (224 + n*(8 + 3wh) for w multiple
    * of 4 — RIFF/hdrl/movi overhead plus n un-padded `00db` chunks)
    * and the frames join checks REAL frame payload sizes and the
    * even-spacing sample map of [[graft.operators.Multimodal
    * .sampleFrames]].
    *
    * JPEG decode runs the same code path but is lossy (not closed-
    * form): spec-locked with tolerance in MultimodalSpec instead. */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.{ImageCodec, Multimodal, VideoCodec}
    import graft.operators.Multimodal.{MediaMeta, MediaRecord}
    val media = docs(s, dir).filter(col("doc_id") < 200)
      .select(col("doc_id"))
      .as[Long]
      .map { id =>
        def rgb(r: Long, g: Long, b: Long): Int =
          (((r % 256) << 16) | ((g % 256) << 8) | (b % 256)).toInt
        if (id % 3 == 0) {
          val w = 16 * (id % 4 + 1).toInt
          val h = 16 * (id % 3 + 1).toInt
          val n = (id % 3 + 2).toInt
          val colors = (0 until n).map(i =>
            (rgb(id * 37 + i * 11, id * 59 + i * 13, id * 83 + i * 17),
              rgb(id * 101 + i * 19, id * 131 + i * 23, id * 163 + i * 29)))
          MediaRecord(id, "video",
            VideoCodec.encodeAvi(w, h, colors, scale = 1,
              rate = Seq(10, 20, 25, 40)((id % 4).toInt)),
            MediaMeta(Some(w), Some(h), None, None))
        } else {
          val w = 8 * (id % 8 + 1).toInt
          val h = 8 * (id % 6 + 1).toInt
          val c1 = rgb(id * 37, id * 59, id * 83)
          val c2 = if (id % 3 == 1) c1 else rgb(id * 101, id * 131, id * 163)
          val bytes =
            if (id % 3 == 1) ImageCodec.encodePng(w, h, c1, c2)
            else ImageCodec.encodeGif(w, h, c1, c2)
          MediaRecord(id, "image", bytes,
            MediaMeta(Some(w), Some(h), None, None))
        }
      }
    val feats = Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("kind"),
        // image container size is encoder-internal; the AVI container
        // size is semantic (honest header arithmetic) and closed-form
        when(col("kind") === "video", col("n_bytes")).as("payload_bytes"),
        element_at(col("feature"), 1).cast("long").as("lum_tl"),
        element_at(col("feature"), 64).cast("long").as("lum_br"),
        aggregate(col("feature"), lit(0L),
          (acc, x) => acc + x.cast("long")).as("lum_sum"))
    val frames = Multimodal.sampleFrames(media, maxFrames = 4).toDF()
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame_bytes"))).cast("long").as("frame_bytes_total"))
    feats.join(frames, Seq("media_id"), "left")
      .orderBy("media_id")
  }

  // Image rows: per-pixel lum = 299r+587g+114b with (r,g,b) closed-form
  // in the id; solid rows -> all 64 cells = l1; split rows -> top 32
  // cells l1, bottom 32 l2 (split at h/2 = cell-row 4 boundary, h a
  // multiple of 8). Video rows: AVI size 224 + n*(8+3wh); n <= 4 frames
  // of 3wh bytes each (DIB stride = 3w exactly, w a multiple of 4).
  val multimodalFeaturesSql: String =
    """WITH m AS (SELECT doc_id AS media_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'video' ELSE 'image' END AS kind
      |  FROM documents WHERE doc_id < 200),
      |v AS (SELECT media_id,
      |    16 * (media_id % 4 + 1) AS w, 16 * (media_id % 3 + 1) AS h,
      |    media_id % 3 + 2 AS n
      |  FROM m WHERE kind = 'video'),
      |lum AS (SELECT media_id,
      |    299*((media_id*37)%256) + 587*((media_id*59)%256)
      |      + 114*((media_id*83)%256) AS l1,
      |    299*((media_id*101)%256) + 587*((media_id*131)%256)
      |      + 114*((media_id*163)%256) AS l2
      |  FROM m WHERE kind = 'image'),
      |img AS (SELECT media_id, CAST(l1 AS BIGINT) AS lum_tl,
      |    CAST(CASE WHEN media_id % 3 = 1 THEN l1 ELSE l2 END AS BIGINT)
      |      AS lum_br,
      |    CAST(CASE WHEN media_id % 3 = 1 THEN 64*l1
      |         ELSE 32*l1 + 32*l2 END AS BIGINT) AS lum_sum
      |  FROM lum),
      |f AS (SELECT media_id,
      |    CAST(224 + n*(8 + 3*w*h) AS BIGINT) AS payload_bytes,
      |    CAST(n AS BIGINT) AS n_frames,
      |    CAST(n * 3*w*h AS BIGINT) AS frame_bytes_total
      |  FROM v)
      |SELECT m.media_id, m.kind, f.payload_bytes,
      |  img.lum_tl, img.lum_br, img.lum_sum, f.n_frames,
      |  f.frame_bytes_total
      |FROM m LEFT JOIN img USING (media_id) LEFT JOIN f USING (media_id)
      |ORDER BY media_id""".stripMargin

  /** REAL video frame PIXELS under the hash gate — the query that
    * retires the engine's last codec stub. Each video row is an honest
    * AVI (RIFF hdrl/strl/movi walk, BI_RGB 24-bit bottom-up DIB
    * frames) built in the executors with frame colors closed-form in
    * (id, frame index); [[graft.operators.VideoCodec]] parses the
    * container, decodes every frame's pixels, and emits the same 8x8
    * mean-luminance grid the still-image path uses. DIB is lossless,
    * dims are multiples of 16, so every cell mean is an exact integer
    * the oracle replays from the color formulas; frame timestamps are
    * the strh clock `i*scale*1000/rate` with rates dividing 1000.
    * MJPG frames exercise the same walk + the ImageIO decoder under
    * spec tolerance (VideoCodecSpec) — lossy, so not oracle-gated.
    *
    * `id % 5 == 2` rows ship as MP4 instead of AVI: `'raw '` RGB24
    * samples (lossless, QuickTime layout) behind a REAL
    * stsd/stts/stsc/stsz/stco sample table ([[graft.operators
    * .Mp4Codec]]) — 2-sample chunks exercise the stsc run expansion,
    * a mid-stream delta change exercises multi-run stts, and a
    * non-ms media timescale exercises the `t*1000/timescale`
    * conversion. Same closed-form colors, so the SAME luminance
    * oracle covers both containers; ts/size arithmetic is exact
    * container math in both. */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.{Mp4Codec, Multimodal, VideoCodec}
    import graft.operators.Multimodal.{MediaMeta, MediaRecord}
    val media = docs(s, dir).filter(col("doc_id") < 150)
      .select(col("doc_id"))
      .as[Long]
      .map { id =>
        def rgb(r: Long, g: Long, b: Long): Int =
          (((r % 256) << 16) | ((g % 256) << 8) | (b % 256)).toInt
        val w = 16 * (id % 4 + 1).toInt
        val h = 16 * (id % 3 + 1).toInt
        val n = (id % 3 + 2).toInt
        val colors = (0 until n).map(i =>
          (rgb(id * 37 + i * 11, id * 59 + i * 13, id * 83 + i * 17),
            rgb(id * 101 + i * 19, id * 131 + i * 23, id * 163 + i * 29)))
        val bytes =
          if (id % 5 == 2) {
            val base = ((id % 5 + 1) * 20).toInt // = 60 for id%5==2
            val timescale = (600 + (id % 4) * 200).toInt
            val deltas = (0 until n).map(i => if (i < 2) base else 2 * base)
            Mp4Codec.encodeMp4Bands(w, h,
              colors.map(c => Seq(c._1, c._2)), timescale, deltas,
              samplesPerChunk = 2)
          } else
            VideoCodec.encodeAvi(w, h, colors, scale = 1,
              rate = Seq(10, 20, 25, 40)((id % 4).toInt))
        MediaRecord(id, "video", bytes, MediaMeta(Some(w), Some(h), None, None))
      }
    Multimodal.frameFeatures(media).toDF()
      .select(col("media_id"), col("frame_index"), col("ts_ms"),
        col("frame_bytes_len"),
        element_at(col("feature"), 1).cast("long").as("lum_tl"),
        element_at(col("feature"), 64).cast("long").as("lum_br"),
        aggregate(col("feature"), lit(0L),
          (acc, x) => acc + x.cast("long")).as("lum_sum"))
      .orderBy("media_id", "frame_index")
  }

  // Frame i of id: top lum from (37+11i, 59+13i, 83+17i), bottom from
  // (101+19i, 131+23i, 163+29i); h a multiple of 16 -> split at the
  // cell-row 4 boundary, 32 top cells / 32 bottom. Payload 3wh bytes
  // for BOTH containers (DIB stride = 3w at w%4==0; 'raw ' rowbytes =
  // 3w by definition). Clock: AVI scale 1, rate in {10,20,25,40}
  // (divide 1000); MP4 (id%5=2) stts deltas 60,60,120,120... units at
  // timescale 600+(id%4)*200 -> t_units*1000 // timescale (floor).
  val multimodalFramesSql: String =
    """WITH p AS (SELECT doc_id AS media_id,
      |    16 * (doc_id % 4 + 1) AS w, 16 * (doc_id % 3 + 1) AS h,
      |    doc_id % 3 + 2 AS n,
      |    doc_id % 5 = 2 AS is_mp4,
      |    600 + (doc_id % 4) * 200 AS tscale,
      |    CASE doc_id % 4 WHEN 0 THEN 10 WHEN 1 THEN 20
      |         WHEN 2 THEN 25 ELSE 40 END AS rate
      |  FROM documents WHERE doc_id < 150),
      |fr AS (SELECT media_id, w, h, rate, is_mp4, tscale,
      |    CAST(i AS INT) AS frame_index,
      |    299*((media_id*37 + i*11)%256) + 587*((media_id*59 + i*13)%256)
      |      + 114*((media_id*83 + i*17)%256) AS l1,
      |    299*((media_id*101 + i*19)%256) + 587*((media_id*131 + i*23)%256)
      |      + 114*((media_id*163 + i*29)%256) AS l2
      |  FROM p, range(4) r(i) WHERE i < n)
      |SELECT media_id, frame_index,
      |  CAST(CASE WHEN is_mp4 THEN
      |      ((CASE WHEN frame_index <= 2 THEN 60 * frame_index
      |        ELSE 120 * (frame_index - 1) END) * 1000) // tscale
      |    ELSE frame_index * 1000 / rate END AS INT) AS ts_ms,
      |  CAST(3 * w * h AS INT) AS frame_bytes_len,
      |  CAST(l1 AS BIGINT) AS lum_tl, CAST(l2 AS BIGINT) AS lum_br,
      |  CAST(32*l1 + 32*l2 AS BIGINT) AS lum_sum
      |FROM fr ORDER BY media_id, frame_index""".stripMargin

  /** REAL byte-level resize under the hash gate. PNG fixtures with
    * power-of-two dims (16/32/64 x 16/32) are resized to longest side
    * <= 32 by [[graft.operators.Multimodal.resize]] — explicit
    * integer nearest-neighbor resample + PNG re-encode — then decoded
    * BACK: `dec_w`/`dec_h` are the pixel-buffer dims of the RESIZED
    * bytes (proof the bytes were rewritten at the right size, not just
    * the meta), `meta_w`/`meta_h` check the meta update rule, and the
    * luminance cells check the resampled pixels. Power-of-two ratios
    * make the NN map exact: the top/bottom halves survive resize
    * precisely (dst row y < dh/2 maps to src row y*sh/dh < sh/2), so
    * every post-resize cell mean is the same closed-form integer as
    * pre-resize — while the dims change. In-bounds rows must pass
    * through with IDENTICAL bytes (no pointless re-encode). */
  def multimodalResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.{ImageCodec, Multimodal}
    import graft.operators.Multimodal.{MediaMeta, MediaRecord}
    val media = docs(s, dir).filter(col("doc_id") < 200)
      .select(col("doc_id"))
      .as[Long]
      .map { id =>
        def rgb(r: Long, g: Long, b: Long): Int =
          (((r % 256) << 16) | ((g % 256) << 8) | (b % 256)).toInt
        val w = 16 << (id % 3).toInt  // 16 | 32 | 64
        val h = 16 << (id % 2).toInt  // 16 | 32
        val c1 = rgb(id * 37, id * 59, id * 83)
        val c2 = rgb(id * 101, id * 131, id * 163)
        MediaRecord(id, "image", ImageCodec.encodePng(w, h, c1, c2),
          MediaMeta(Some(w), Some(h), None, None))
      }
    Multimodal.resize(media, maxDim = 32)
      .map { r =>
        val img = ImageCodec.decodeImage(r.bytes)
        val f = if (img == null) null else ImageCodec.lumaGrid(img)
        (r.media_id, r.meta.width, r.meta.height,
          if (img == null) None else Some(img.getWidth),
          if (img == null) None else Some(img.getHeight),
          if (f == null) None else Some(f(0).toLong),
          if (f == null) None else Some(f(63).toLong),
          if (f == null) None else Some(f.map(_.toLong).sum))
      }
      .toDF("media_id", "meta_w", "meta_h", "dec_w", "dec_h",
        "lum_tl", "lum_br", "lum_sum")
      .orderBy("media_id")
  }

  // Dims: w = 16<<(id%3), h = 16<<(id%2); maxDim 32 -> only w=64 rows
  // scale (by exactly 1/2). Halves are color-uniform, so cell means
  // are resize-invariant; dims are the witness of the byte rewrite.
  val multimodalResizeSql: String =
    """WITH p AS (SELECT doc_id AS media_id,
      |    CASE doc_id % 3 WHEN 0 THEN 16 WHEN 1 THEN 32 ELSE 64 END AS w,
      |    CASE doc_id % 2 WHEN 0 THEN 16 ELSE 32 END AS h,
      |    299*((doc_id*37)%256) + 587*((doc_id*59)%256)
      |      + 114*((doc_id*83)%256) AS l1,
      |    299*((doc_id*101)%256) + 587*((doc_id*131)%256)
      |      + 114*((doc_id*163)%256) AS l2
      |  FROM documents WHERE doc_id < 200),
      |r AS (SELECT media_id, l1, l2,
      |    CASE WHEN GREATEST(w, h) > 32 THEN w * 32 / GREATEST(w, h)
      |         ELSE w END AS nw,
      |    CASE WHEN GREATEST(w, h) > 32 THEN h * 32 / GREATEST(w, h)
      |         ELSE h END AS nh
      |  FROM p)
      |SELECT media_id, CAST(nw AS INT) AS meta_w, CAST(nh AS INT) AS meta_h,
      |  CAST(nw AS INT) AS dec_w, CAST(nh AS INT) AS dec_h,
      |  CAST(l1 AS BIGINT) AS lum_tl, CAST(l2 AS BIGINT) AS lum_br,
      |  CAST(32*l1 + 32*l2 AS BIGINT) AS lum_sum
      |FROM r ORDER BY media_id""".stripMargin

  /** Real header parsing under the hash gate: deterministic
    * honest-format PNG/JPEG/WAV/MP4 payloads (every varying header
    * field a closed-form function of the id) are built byte-for-byte
    * to the public container layouts, then parsed BACK by the native
    * [[graft.operators.Multimodal.mediaMeta]] expression — the oracle
    * predicts the parsed struct without parsing (generator ∘ parser =
    * identity on honest containers; corrupt/truncated behavior is
    * spec-locked in MultimodalSpec on hand-built fixtures). */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val base = docs(s, dir).filter(col("doc_id") < 300)
      .select(col("doc_id").as("media_id"))
    val w = (col("media_id") % 640 + 1).cast("int")
    val h = (col("media_id") % 480 + 1).cast("int")
    val rate = (col("media_id") % 8 * 4000 + 8000).cast("int")
    val ch = (col("media_id") % 2 + 1).cast("int")
    // mp4 duration: timescale varies per row and divides the duration
    // exactly, so duration_ms = (id%30+1)*1000 is closed-form
    val ts = ((col("media_id") % 4 + 1) * lit(600)).cast("int")
    val dur = (ts * (col("media_id") % 30 + 1)).cast("int")
    val bytes = when(col("media_id") % 4 === 0, Multimodal.pngBytes(w, h))
      .when(col("media_id") % 4 === 1, Multimodal.jpegBytes(w, h))
      .when(col("media_id") % 4 === 2, Multimodal.wavBytes(rate, ch))
      .otherwise(Multimodal.mp4Bytes(w, h, ts, dur))
    base.withColumn("m", Multimodal.mediaMeta(bytes))
      .select(col("media_id"), col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"),
        col("m.sample_rate").as("sample_rate"),
        col("m.channels").as("channels"),
        col("m.bit_depth").as("bit_depth"),
        col("m.duration_ms").as("duration_ms"))
      .orderBy("media_id")
  }

  val multimodalMetaSql: String =
    """SELECT doc_id AS media_id,
      |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
      |       WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
      |  CASE WHEN doc_id % 4 IN (0, 1, 3)
      |       THEN CAST(doc_id % 640 + 1 AS INT) END AS width,
      |  CASE WHEN doc_id % 4 IN (0, 1, 3)
      |       THEN CAST(doc_id % 480 + 1 AS INT) END AS height,
      |  CASE WHEN doc_id % 4 = 2
      |       THEN CAST(doc_id % 8 * 4000 + 8000 AS INT) END AS sample_rate,
      |  CAST(CASE doc_id % 4 WHEN 0 THEN 4 WHEN 1 THEN 3
      |       WHEN 2 THEN doc_id % 2 + 1 END AS INT) AS channels,
      |  CAST(CASE WHEN doc_id % 4 < 2 THEN 8
      |       WHEN doc_id % 4 = 2 THEN 16 END AS INT) AS bit_depth,
      |  CASE WHEN doc_id % 4 = 3
      |       THEN CAST((doc_id % 30 + 1) * 1000 AS INT) END AS duration_ms
      |FROM documents WHERE doc_id < 300 ORDER BY media_id""".stripMargin

  /** REAL video frame timeline under the hash gate: honest MP4s carry
    * a full `mdia{mdhd, minf{stbl{stts}}}` ladder with two
    * (count, delta) runs closed-form in the id; the native
    * `graft_mp4_timeline` expression walks the boxes and expands the
    * sample table into cumulative per-frame start times (media
    * timescale from mdhd), which posexplode turns into
    * (frame_index, ts_ms) rows the DuckDB oracle replays from the run
    * formula. Complements q_multimodal_frames: the TIMELINE covers
    * containers whose codec the JVM cannot decode (H.264-in-MP4),
    * while AVI/DIB covers full pixel extraction. */
  def multimodalTimeline(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val base = docs(s, dir).filter(col("doc_id") < 300)
      .select(col("doc_id").as("media_id"))
    val w = (col("media_id") % 640 + 1).cast("int")
    val h = (col("media_id") % 480 + 1).cast("int")
    val n1 = (col("media_id") % 3 + 1).cast("int")
    val d1 = ((col("media_id") % 7 + 1) * 100).cast("int")
    val n2 = (col("media_id") % 2 + 1).cast("int")
    val d2 = ((col("media_id") % 5 + 1) * 200).cast("int")
    base.select(col("media_id"), posexplode(Multimodal.frameTimeline(
        Multimodal.mp4BytesWithTimeline(w, h, n1, d1, n2, d2))))
      .toDF("media_id", "frame_index", "ts_ms")
      .orderBy("media_id", "frame_index")
  }

  // Run mirror: frame j starts at j*d1 while inside the first stts
  // run, then n1*d1 + (j-n1)*d2; n1+n2 <= 5 frames per fixture.
  val multimodalTimelineSql: String =
    """WITH p AS (SELECT doc_id AS media_id,
      |    doc_id % 3 + 1 AS n1, (doc_id % 7 + 1) * 100 AS d1,
      |    doc_id % 2 + 1 AS n2, (doc_id % 5 + 1) * 200 AS d2
      |  FROM documents WHERE doc_id < 300)
      |SELECT media_id, CAST(j AS INT) AS frame_index,
      |  CAST(CASE WHEN j < n1 THEN j * d1
      |       ELSE n1 * d1 + (j - n1) * d2 END AS INT) AS ts_ms
      |FROM p, range(8) r(j) WHERE j < n1 + n2
      |ORDER BY media_id, frame_index""".stripMargin

  /** REAL audio decode under the hash gate — the audio analog of
    * q_multimodal_features: complete honest WAVs (mono 16-bit PCM,
    * 64 samples, each sample a closed-form function of the id) are
    * built byte-for-byte in column land, then decoded BACK through the
    * JDK audio stack ([[graft.operators.AudioCodec]]: AudioSystem
    * format detection + frame iteration) into integer-exact features —
    * per-segment absolute sums, total, zero crossings — that the
    * DuckDB oracle recomputes from the sample formula without ever
    * seeing the bytes (encoder ∘ decoder = identity on PCM). */
  def multimodalAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.{AudioCodec, Multimodal}
    val rate = (col("media_id") % 8 * 4000 + 8000).cast("int")
    docs(s, dir).filter(col("doc_id") < 200)
      .select(col("doc_id").as("media_id"))
      .withColumn("bytes", Multimodal.wavBytesWithData(rate, col("media_id")))
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .map { case (id, b) =>
        val f = AudioCodec.decodePcm(b)
        if (f == null) (id, None: Option[Int], None: Option[Long],
          None: Option[Long], None: Option[Long], None: Option[Long],
          None: Option[Long])
        else (id, Some(f.sampleRate), Some(f.nSamples), Some(f.segAbs(0)),
          Some(f.segAbs(7)), Some(f.absTotal), Some(f.zeroCrossings))
      }
      .toDF("media_id", "sample_rate", "n_samples", "seg_abs_first",
        "seg_abs_last", "abs_total", "zero_crossings")
      .orderBy("media_id")
  }

  // Sample mirror: s_j = ((id*37 + j*101) % 4096) - 2048, j in [0, 64);
  // segments are 8 samples wide (64/8); a zero sample never counts as
  // a crossing on either side (strict sign flip in both engines).
  val multimodalAudioSql: String =
    """WITH s AS (SELECT doc_id AS media_id, j,
      |    ((doc_id*37 + j*101) % 4096) - 2048 AS v
      |  FROM documents, range(64) r(j) WHERE doc_id < 200),
      |x AS (SELECT media_id, j, v,
      |    lag(v) OVER (PARTITION BY media_id ORDER BY j) AS pv
      |  FROM s)
      |SELECT media_id,
      |  CAST(media_id % 8 * 4000 + 8000 AS INT) AS sample_rate,
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(SUM(CASE WHEN j < 8 THEN ABS(v) END) AS BIGINT)
      |    AS seg_abs_first,
      |  CAST(SUM(CASE WHEN j >= 56 THEN ABS(v) END) AS BIGINT)
      |    AS seg_abs_last,
      |  CAST(SUM(ABS(v)) AS BIGINT) AS abs_total,
      |  CAST(SUM(CASE WHEN (pv > 0 AND v < 0) OR (pv < 0 AND v > 0)
      |           THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
      |FROM x GROUP BY media_id
      |ORDER BY media_id""".stripMargin

  lazy val all: Map[String, ((SparkSession, String) => DataFrame, String)] =
    Map(
      "q_multimodal_features" -> (multimodalFeatures _, multimodalFeaturesSql),
      "q_multimodal_frames" -> (multimodalFrames _, multimodalFramesSql),
      "q_multimodal_resize" -> (multimodalResize _, multimodalResizeSql),
      "q_multimodal_meta" -> (multimodalMeta _, multimodalMetaSql),
      "q_multimodal_audio" -> (multimodalAudio _, multimodalAudioSql),
      "q_multimodal_timeline" -> (multimodalTimeline _, multimodalTimelineSql))
}
