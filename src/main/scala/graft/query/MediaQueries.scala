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

  /** Embedding-free IMAGE near-dup under the hash gate: real PNGs
    * (four closed-form horizontal color bands, 32x32 -> each band is
    * exactly 16 grid cells) are decoded and perceptually hashed
    * ([[graft.operators.ImageCodec.aHash]]: bit i = cell i strictly
    * above the grid mean, exact integer comparison), then paired by
    * the pigeonhole-banded Hamming self-join
    * ([[graft.operators.Dedup.signatureNearDups]], maxDist 16 =
    * at most one band-bit differs). Banding gives CERTAIN recall at
    * the distance, so the Spark output equals the exact threshold
    * pair set the DuckDB oracle enumerates from the band-comparison
    * formula (`4*q_j > q_0+..+q_3` sets bits 16j..16j+15) — including
    * every hamming value, bit_count for bit_count. Pixels never
    * shuffle; only (id, sig, block) rows do. */
  def imagePhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.{ImageCodec, Multimodal}
    import graft.operators.Multimodal.{MediaMeta, MediaRecord}
    val media = docs(s, dir).filter(col("doc_id") < 150)
      .select(col("doc_id"))
      .as[Long]
      .map { id =>
        def rgb(r: Long, g: Long, b: Long): Int =
          (((r % 256) << 16) | ((g % 256) << 8) | (b % 256)).toInt
        val bands = (0 until 4).map(j =>
          rgb(id * 37 + j * 11, id * 59 + j * 13, id * 83 + j * 17))
        MediaRecord(id, "image", ImageCodec.encodePngBands(32, 32, bands),
          MediaMeta(Some(32), Some(32), None, None))
      }
    Multimodal.imageNearDups(media, maxDist = 16)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
      .orderBy("id_a", "id_b")
  }

  // Band j luminance q_j = 299*((id*37+j*11)%256) + 587*((id*59+j*13)%256)
  // + 114*((id*83+j*17)%256); aHash bits 16j..16j+15 set iff 4*q_j > sum.
  // Mask constants are the signed-64 values of 0xFFFF << 16j (j=3 wraps
  // negative: -(2^48)). Pigeonhole banding has certain recall, so the
  // engine output IS the exact threshold set.
  val imagePhashDedupSql: String =
    """WITH q AS (SELECT doc_id AS media_id, j,
      |    299*((doc_id*37 + j*11)%256) + 587*((doc_id*59 + j*13)%256)
      |      + 114*((doc_id*83 + j*17)%256) AS ql
      |  FROM documents, range(4) r(j) WHERE doc_id < 150),
      |qs AS (SELECT media_id, j, ql,
      |    SUM(ql) OVER (PARTITION BY media_id) AS s FROM q),
      |h AS (SELECT media_id,
      |    CAST(SUM(CASE WHEN 4*ql > s
      |         THEN CASE j WHEN 0 THEN 65535
      |                     WHEN 1 THEN 4294901760
      |                     WHEN 2 THEN 281470681743360
      |                     ELSE -281474976710656 END
      |         ELSE 0 END) AS BIGINT) AS sig
      |  FROM qs GROUP BY media_id)
      |SELECT a.media_id AS id_a, b.media_id AS id_b,
      |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
      |FROM h a JOIN h b ON a.media_id < b.media_id
      |WHERE bit_count(xor(a.sig, b.sig)) <= 16
      |ORDER BY id_a, id_b""".stripMargin

  /** VIDEO near-dup under the hash gate — the video face of
    * q_image_phash_dedup: honest AVIs (4-band DIB frames, 32x32,
    * 2-4 frames, every band luminance closed-form in (id, frame,
    * band)) are fully decoded, per-cell luminance SUMS over frames
    * form the whole-video signature ([[graft.operators.Multimodal
    * .videoHashes]] — integer-exact Longs; the strict-above-mean
    * comparison is scale-free), and pairs come from the same
    * certain-recall banded Hamming join. The oracle replays the
    * band-sum comparison (`4*sum_j > total`) per video and
    * enumerates the exact threshold pair set. Frames never shuffle;
    * only (id, sig, block) rows do. */
  def videoPhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.{Multimodal, VideoCodec}
    import graft.operators.Multimodal.{MediaMeta, MediaRecord}
    val media = docs(s, dir).filter(col("doc_id") < 150)
      .select(col("doc_id"))
      .as[Long]
      .map { id =>
        def rgb(r: Long, g: Long, b: Long): Int =
          (((r % 256) << 16) | ((g % 256) << 8) | (b % 256)).toInt
        val n = (id % 3 + 2).toInt
        val frames = (0 until n).map(i => (0 until 4).map(j =>
          rgb(id * 37 + i * 11 + j * 7, id * 59 + i * 13 + j * 19,
            id * 83 + i * 17 + j * 23)))
        MediaRecord(id, "video",
          VideoCodec.encodeAviBands(32, 32, frames, scale = 1, rate = 25),
          MediaMeta(Some(32), Some(32), None, None))
      }
    Multimodal.videoNearDups(media, maxDist = 16)
      .select(col("id_a"), col("id_b"),
        col("hamming").cast("int").as("hamming"))
      .orderBy("id_a", "id_b")
  }

  // Band (id, frame i, band j) luminance from the color formula; the
  // signature sums over frames per band (16 cells each), bits set iff
  // 4*sum_j > total. Same signed-64 mask constants as the image query.
  val videoPhashDedupSql: String =
    """WITH q AS (SELECT doc_id AS media_id, i, j,
      |    299*((doc_id*37 + i*11 + j*7)%256)
      |      + 587*((doc_id*59 + i*13 + j*19)%256)
      |      + 114*((doc_id*83 + i*17 + j*23)%256) AS ql
      |  FROM documents, range(4) fi(i), range(4) bj(j)
      |  WHERE doc_id < 150 AND i < doc_id % 3 + 2),
      |b AS (SELECT media_id, j, SUM(ql) AS qs FROM q GROUP BY 1, 2),
      |bs AS (SELECT media_id, j, qs,
      |    SUM(qs) OVER (PARTITION BY media_id) AS s FROM b),
      |h AS (SELECT media_id,
      |    CAST(SUM(CASE WHEN 4*qs > s
      |         THEN CASE j WHEN 0 THEN 65535
      |                     WHEN 1 THEN 4294901760
      |                     WHEN 2 THEN 281470681743360
      |                     ELSE -281474976710656 END
      |         ELSE 0 END) AS BIGINT) AS sig
      |  FROM bs GROUP BY media_id)
      |SELECT a.media_id AS id_a, b.media_id AS id_b,
      |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
      |FROM h a JOIN h b ON a.media_id < b.media_id
      |WHERE bit_count(xor(a.sig, b.sig)) <= 16
      |ORDER BY id_a, id_b""".stripMargin

  /** AUDIO near-dup under the hash gate — completing the modality set
    * (image/video/audio over ONE banded signature join). Honest WAVs
    * (mono 16-bit PCM, 64 closed-form samples) decode through the JDK
    * audio stack to 64 per-segment absolute sums (one sample each
    * here), hashed strict-above-mean ([[graft.operators.ImageCodec
    * .aHashSums]]); pairs from the certain-recall banded Hamming join.
    * The oracle replays every bit (`64*|s_j| > sum|s|`, bit j = 1<<j,
    * bit 63 as the signed min-long literal — DuckDB's `<<` raises on
    * 1<<63) and enumerates the exact threshold pair set. */
  def audioPhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal
    import graft.operators.Multimodal.{MediaMeta, MediaRecord}
    val rate = (col("media_id") % 8 * 4000 + 8000).cast("int")
    val media = docs(s, dir).filter(col("doc_id") < 150)
      .select(col("doc_id").as("media_id"))
      .withColumn("bytes", Multimodal.wavBytesWithData(rate, col("media_id")))
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .map { case (id, b) =>
        MediaRecord(id, "audio", b, MediaMeta(None, None, None, None))
      }
    Multimodal.audioNearDups(media, maxDist = 8)
      .select(col("id_a"), col("id_b"),
        col("hamming").cast("int").as("hamming"))
      .orderBy("id_a", "id_b")
  }

  // Sample mirror: s_j = ((id*37 + j*101) % 4096) - 2048; with 64
  // samples each segment is one sample, so cell j = |s_j| exactly.
  val audioPhashDedupSql: String =
    """WITH s AS (SELECT doc_id AS media_id, j,
      |    ABS(((doc_id*37 + j*101) % 4096) - 2048) AS a
      |  FROM documents, range(64) r(j) WHERE doc_id < 150),
      |ss AS (SELECT media_id, j, a,
      |    SUM(a) OVER (PARTITION BY media_id) AS t FROM s),
      |h AS (SELECT media_id,
      |    CAST(SUM(CASE WHEN 64*a > t
      |         THEN CASE WHEN j = 63
      |              THEN CAST(-9223372036854775808 AS BIGINT)
      |              ELSE CAST(1 AS BIGINT) << j END
      |         ELSE 0 END) AS BIGINT) AS sig
      |  FROM ss GROUP BY media_id)
      |SELECT a.media_id AS id_a, b.media_id AS id_b,
      |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
      |FROM h a JOIN h b ON a.media_id < b.media_id
      |WHERE bit_count(xor(a.sig, b.sig)) <= 8
      |ORDER BY id_a, id_b""".stripMargin

  /** Shared fixture recipe for the incremental-screen gate: even ids
    * are 4-band 32x32 PNGs (the q_image_phash_dedup color formula),
    * odd ids honest 64-sample WAVs (the q_audio_phash_dedup sample
    * formula) — a genuinely MIXED corpus, so the kind-confined join is
    * exercised for real. */
  private def screenFixtures(s: SparkSession, base: DataFrame)
      : org.apache.spark.sql.Dataset[graft.operators.Multimodal.MediaRecord] = {
    import s.implicits._
    import graft.operators.{ImageCodec, Multimodal}
    import graft.operators.Multimodal.{MediaMeta, MediaRecord}
    val rate = (col("doc_id") % 8 * 4000 + 8000).cast("int")
    base.select(col("doc_id"),
        when(col("doc_id") % 2 === 1,
          Multimodal.wavBytesWithData(rate, col("doc_id"))).as("wav"))
      .as[(Long, Array[Byte])]
      .map { case (id, wav) =>
        if (wav != null)
          MediaRecord(id, "audio", wav, MediaMeta(None, None, None, None))
        else {
          def rgb(r: Long, g: Long, b: Long): Int =
            (((r % 256) << 16) | ((g % 256) << 8) | (b % 256)).toInt
          val bands = (0 until 4).map(j =>
            rgb(id * 37 + j * 11, id * 59 + j * 13, id * 83 + j * 17))
          MediaRecord(id, "image", ImageCodec.encodePngBands(32, 32, bands),
            MediaMeta(Some(32), Some(32), None, None))
        }
      }
  }

  // Index staging memo — the signature index is a pay-once-at-write
  // artifact (decode the corpus once, persist 17 bytes/row); a repeat
  // call in the same (application, sfDir) must time the SCREEN join,
  // not re-decode and re-write the corpus. Keyed like the bucketed
  // staging memo (CoreQueries.bucketStaged).
  private val sigStaged =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** INCREMENTAL near-dup screening under the hash gate — the
    * 100 TB media-dedup shape: a corpus (ids < 100, mixed real
    * PNGs + WAVs) is decoded ONCE into a persisted (id, kind, sig)
    * signature index ([[graft.operators.Multimodal
    * .saveSignatureIndex]], memoized per application like the
    * bucketed-join staging); an incoming batch (ids 100-199) decodes
    * itself, loads the index, and joins it through the kind-confined
    * certain-recall banded Hamming join ([[graft.operators.Multimodal
    * .screenMedia]]). No corpus re-decode, no self-join — batch
    * growth costs O(batch), not O(corpus). The oracle replays BOTH
    * modalities' signatures closed-form (image band masks + audio
    * per-bit replay) and enumerates the exact cross pair set; parity
    * keeps each pair in exactly one modality. */
  def mediaScreen(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val corpus = screenFixtures(s, docs(s, dir).filter(col("doc_id") < 100))
    val batch = screenFixtures(s,
      docs(s, dir).filter(col("doc_id") >= 100 && col("doc_id") < 200))
    val tag = (s.sparkContext.applicationId + "_" +
      Integer.toHexString(dir.hashCode)).replaceAll("[^a-zA-Z0-9]", "_")
    val idxDir = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_sigidx_$tag").toString
    if (sigStaged.add(tag))
      Multimodal.saveSignatureIndex(Multimodal.mediaHashes(corpus), idxDir)
    Multimodal.screenMedia(batch, Multimodal.loadSignatureIndex(s, idxDir),
        maxDist = 16)
      .select(col("id_a"), col("id_b"), col("kind"),
        col("hamming").cast("int").as("hamming"))
      .orderBy("id_a", "id_b")
  }

  // Both signature families replayed closed-form (image: band masks,
  // audio: per-bit with the min-long literal for bit 63), UNION ALL'd
  // with their kind, then the exact cross enumeration corpus x batch
  // on kind. SUMs cast back to BIGINT before xor (DuckDB SUM(BIGINT)
  // is HUGEINT; 128-bit xor would sign-extend). (id_a, id_b) is unique
  // — parity fixes each pair's modality.
  val mediaScreenSql: String = mediaScreenSqlAt(16)

  // Closed-form (media_id, kind, sig) CTE chain `h` shared by every
  // screen oracle (ids < 200; audio = odd ids, image = even ids).
  // A def, not a val: mediaScreenSql above initializes first.
  private def mediaSigCtes: String =
    """sa AS (SELECT doc_id AS media_id, j,
      |    ABS(((doc_id*37 + j*101) % 4096) - 2048) AS a
      |  FROM documents, range(64) ra(j)
      |  WHERE doc_id < 200 AND doc_id % 2 = 1),
      |ss AS (SELECT media_id, j, a,
      |    SUM(a) OVER (PARTITION BY media_id) AS t FROM sa),
      |ha AS (SELECT media_id, 'audio' AS kind,
      |    CAST(SUM(CASE WHEN 64*a > t
      |         THEN CASE WHEN j = 63
      |              THEN CAST(-9223372036854775808 AS BIGINT)
      |              ELSE CAST(1 AS BIGINT) << j END
      |         ELSE 0 END) AS BIGINT) AS sig
      |  FROM ss GROUP BY media_id),
      |q AS (SELECT doc_id AS media_id, j,
      |    299*((doc_id*37 + j*11)%256) + 587*((doc_id*59 + j*13)%256)
      |      + 114*((doc_id*83 + j*17)%256) AS ql
      |  FROM documents, range(4) rq(j)
      |  WHERE doc_id < 200 AND doc_id % 2 = 0),
      |qs AS (SELECT media_id, j, ql,
      |    SUM(ql) OVER (PARTITION BY media_id) AS s FROM q),
      |hi AS (SELECT media_id, 'image' AS kind,
      |    CAST(SUM(CASE WHEN 4*ql > s
      |         THEN CASE j WHEN 0 THEN 65535
      |                     WHEN 1 THEN 4294901760
      |                     WHEN 2 THEN 281470681743360
      |                     ELSE -281474976710656 END
      |         ELSE 0 END) AS BIGINT) AS sig
      |  FROM qs GROUP BY media_id),
      |h AS (SELECT * FROM ha UNION ALL SELECT * FROM hi)""".stripMargin

  private def mediaScreenSqlAt(dist: Int): String =
    s"""WITH $mediaSigCtes
       |SELECT a.media_id AS id_a, b.media_id AS id_b, a.kind AS kind,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
       |FROM h a JOIN h b ON a.kind = b.kind
       |WHERE a.media_id < 100 AND b.media_id >= 100
       |  AND bit_count(xor(a.sig, b.sig)) <= $dist
       |ORDER BY id_a, id_b""".stripMargin

  /** The SAME screen through the multi-index-hashing candidate path
    * ([[graft.operators.Multimodal.screenMediaMih]]): 16-bit substring
    * keys + 137-mask batch-side probe expansion instead of ~7-bit
    * banded blocks, at the perceptual-hash distance 8 (the realistic
    * screening threshold — maxDist 16 above stress-tests recall on the
    * 4-band fixtures). Both paths have CERTAIN recall, so this query's
    * oracle is the same closed-form enumeration at distance 8 — the
    * gate certifies path-equivalence end-to-end, not just the pair
    * count. */
  def mediaScreenMih(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    val corpus = screenFixtures(s, docs(s, dir).filter(col("doc_id") < 100))
    val batch = screenFixtures(s,
      docs(s, dir).filter(col("doc_id") >= 100 && col("doc_id") < 200))
    val tag = (s.sparkContext.applicationId + "_" +
      Integer.toHexString(dir.hashCode)).replaceAll("[^a-zA-Z0-9]", "_")
    val idxDir = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_sigidx_$tag").toString
    if (sigStaged.add(tag))
      Multimodal.saveSignatureIndex(Multimodal.mediaHashes(corpus), idxDir)
    Multimodal.screenMediaMih(batch, Multimodal.loadSignatureIndex(s, idxDir),
        maxDist = 8)
      .select(col("id_a"), col("id_b"), col("kind"),
        col("hamming").cast("int").as("hamming"))
      .orderBy("id_a", "id_b")
  }

  val mediaScreenMihSql: String = mediaScreenSqlAt(8)

  /** The streaming face of the media screen, with a GROWING index
    * ([[graft.streaming.StreamingIngest.screenMediaIngest]]): the
    * base corpus (ids < 100) persists as `batch=base`; two files
    * (ids 100-149, then 150-199 AFTER a checkpointed restart) replay
    * through the REAL file-source stream — each micro-batch screens
    * against base + prior admissions via the kind-confined MIH join
    * and admits its clean signatures as an idempotent `batch=b<id>`
    * partition. The surviving `clean/` set must equal the SEQUENTIAL
    * semantics the oracle recomputes closed-form: f1 vs base, then
    * f2 vs base UNION clean(f1) — so the gate certifies exactly-once
    * progress AND index growth, not just one join. */
  def mediaScreenStream(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    import graft.operators.Multimodal
    val all = screenFixtures(s, docs(s, dir).filter(col("doc_id") < 200))
    val tag = s.sparkContext.applicationId.replaceAll("[^a-zA-Z0-9]", "_")
    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_mediastream_$tag").toString
    val basePath = new org.apache.hadoop.fs.Path(base)
    basePath.getFileSystem(s.sparkContext.hadoopConfiguration)
      .delete(basePath, true)
    val in = s"$base/in"; val ckpt = s"$base/ckpt"; val out = s"$base/out"
    val idx = s"$base/index"
    Files.createDirectories(Paths.get(in))
    Multimodal.saveSignatureIndex(
      Multimodal.mediaHashes(all.filter(col("media_id") < 100)),
      s"$idx/batch=base")
    def addFile(df: DataFrame, name: String): Unit = {
      val tmp = s"$base/stage_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(s"$in/$name"))
      ()
    }
    def screen(): Unit =
      graft.streaming.StreamingIngest.screenMediaIngest(
        s.readStream.schema(Multimodal.mediaSchema).parquet(in),
        idx, maxDist = 8, ckpt, out).awaitTermination()
    addFile(all.filter(col("media_id") >= 100 && col("media_id") < 150)
      .toDF(), "f1.parquet")
    screen()
    addFile(all.filter(col("media_id") >= 150).toDF(), "f2.parquet")
    screen() // restart: only the new file may be (re)processed
    // certify the full ROUTING, not just survivors: every batch item
    // lands in exactly one of clean/ and flagged/
    s.read.parquet(s"$out/clean").withColumn("status", lit("clean"))
      .unionByName(
        s.read.parquet(s"$out/flagged").withColumn("status", lit("flagged")))
      .select(col("id"), col("kind"), col("status"))
      .orderBy("id")
  }

  val mediaScreenStreamSql: String =
    s"""WITH $mediaSigCtes,
       |base AS (SELECT * FROM h WHERE media_id < 100),
       |f1 AS (SELECT * FROM h WHERE media_id >= 100 AND media_id < 150),
       |f2 AS (SELECT * FROM h WHERE media_id >= 150),
       |hit1 AS (SELECT DISTINCT b.media_id FROM base a JOIN f1 b
       |  ON a.kind = b.kind AND bit_count(xor(a.sig, b.sig)) <= 8),
       |clean1 AS (SELECT * FROM f1
       |  WHERE media_id NOT IN (SELECT media_id FROM hit1)),
       |idx2 AS (SELECT * FROM base UNION ALL SELECT * FROM clean1),
       |hit2 AS (SELECT DISTINCT b.media_id FROM idx2 a JOIN f2 b
       |  ON a.kind = b.kind AND bit_count(xor(a.sig, b.sig)) <= 8),
       |clean2 AS (SELECT * FROM f2
       |  WHERE media_id NOT IN (SELECT media_id FROM hit2))
       |SELECT media_id AS id, kind,
       |  CASE WHEN media_id IN (SELECT media_id FROM hit1)
       |       THEN 'flagged' ELSE 'clean' END AS status FROM f1
       |UNION ALL
       |SELECT media_id AS id, kind,
       |  CASE WHEN media_id IN (SELECT media_id FROM hit2)
       |       THEN 'flagged' ELSE 'clean' END AS status FROM f2
       |ORDER BY id""".stripMargin

  /** SHIFT-ROBUST audio dedup under the derived-boolean gate (the
    * recall-gate pattern): each group g < 40 plants an original clip
    * (two bin-aligned sines, bins closed-form in g), a copy shifted
    * by two whole windows of silence, and a spectrally distinct clip.
    * Spectral landmark fingerprints ([[graft.operators.SpectralCodec]],
    * Wang ISMIR 2003) must pair original-with-shifted at overlap 1.0
    * — bin-aligned sines are window-periodic, so the invariance is
    * EXACT, not a margin — while the envelope hash provably fails
    * this shift (SpectralCodecSpec pins both) and the distinct clip
    * stays out at the 0.5 threshold (disjoint bin ranges; shared-bin
    * cross-group hashes cap measured jaccard well under 0.2). The
    * oracle recomputes the group universe and expected booleans
    * closed-form. */
  def audioSpectralDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.{AudioCodec, Multimodal, SpectralCodec}
    import graft.operators.Multimodal.{MediaMeta, MediaRecord}
    val media = docs(s, dir).filter(col("doc_id") < 40)
      .select(col("doc_id")).as[Long]
      .flatMap { g =>
        val none = MediaMeta(None, None, None, None)
        val w = SpectralCodec.WindowSize
        def sine(bins: Seq[Long], silence: Int): Array[Byte] = {
          val n = 8 * w
          val pcm = new Array[Short](silence * w + n)
          var i = 0
          while (i < n) {
            val t = i.toDouble / w
            val v = bins.map(b =>
              8000.0 * StrictMath.sin(2 * StrictMath.PI * b * t)).sum
            pcm(silence * w + i) =
              math.max(-32768L, math.min(32767L, StrictMath.round(v))).toShort
            i += 1
          }
          AudioCodec.encodeWav(8000, pcm)
        }
        // bin RANGES are pairwise disjoint: originals use [5,33]+[45,75],
        // distinct clips [80,102]+[108,124] — no true-bin collisions
        val b1 = g % 29 + 5; val b2 = g % 31 + 45
        val c1 = g % 23 + 80; val c2 = g % 17 + 108
        Seq(
          MediaRecord(g * 10, "audio", sine(Seq(b1, b2), 0), none),
          MediaRecord(g * 10 + 1, "audio", sine(Seq(b1, b2), 2), none),
          MediaRecord(g * 10 + 2, "audio", sine(Seq(c1, c2), 0), none))
      }
    val pairs = Multimodal.audioFingerprintNearDups(media, threshold = 0.5)
      .withColumn("g", (col("id_a") / 10).cast("long"))
    val agg = pairs.groupBy("g").agg(
      max(col("id_a") % 10 === 0 && col("id_b") % 10 === 1 &&
        col("overlap") >= 0.9).as("shifted_match"),
      max(col("id_a") % 10 === 2 || col("id_b") % 10 === 2).as("dirty"))
    docs(s, dir).filter(col("doc_id") < 40).select(col("doc_id").as("g"))
      .join(agg, Seq("g"), "left")
      .select(col("g"),
        coalesce(col("shifted_match"), lit(false)).as("shifted_match"),
        (!coalesce(col("dirty"), lit(false))).as("distinct_clean"))
      .orderBy("g")
  }

  val audioSpectralDedupSql: String =
    """SELECT doc_id AS g, true AS shifted_match, true AS distinct_clean
      |FROM documents WHERE doc_id < 40 ORDER BY g""".stripMargin

  /** SHIFT-ROBUST video near-dup under the FULL hash gate: per group
    * g < 40, an original AVI (4 band-frames, colors closed-form in
    * (g, frame, band)), the same clip behind a two-frame non-uniform
    * "title card" leader, and a spectrally different clip. Frames
    * decode for real ([[graft.operators.VideoCodec]]), per-frame
    * aHashes are closed-form (band comparisons), and the
    * temporal landmark sets ([[graft.operators.Multimodal
    * .videoTemporalFingerprints]]) with their exact pairwise Jaccards
    * are therefore ENUMERABLE: the oracle rebuilds every clip's
    * landmark set from the color formulas and lists the exact pair
    * set at threshold 0.5 — including incidental cross-group pairs
    * (the 4-band fixture hash space is small, so distinct groups DO
    * collide; both sides compute the same deterministic function).
    * Certifies what the whole-video SUM signature cannot: a prepended
    * leader leaves the body's landmarks intact. */
  def videoTemporalDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.operators.{Multimodal, VideoCodec}
    import graft.operators.Multimodal.{MediaMeta, MediaRecord}
    val media = docs(s, dir).filter(col("doc_id") < 40)
      .select(col("doc_id")).as[Long]
      .flatMap { g =>
        val none = MediaMeta(Some(32), Some(32), None, None)
        def rgb(r: Long, gg: Long, b: Long): Int =
          (((r % 256) << 16) | ((gg % 256) << 8) | (b % 256)).toInt
        val orig = (0 until 8).map(i => (0 until 4).map(j =>
          rgb(g * 37 + i * 91 + j * 37, g * 59 + i * 129 + j * 119,
            g * 83 + i * 67 + j * 93)))
        val other = (0 until 8).map(i => (0 until 4).map(j =>
          rgb(g * 41 + i * 113 + j * 53, g * 61 + i * 141 + j * 87,
            g * 89 + i * 79 + j * 101)))
        // a NON-uniform "title card" leader: the body's temporal
        // landmarks survive it untouched (the property this gate
        // certifies); MultimodalSpec separately proves a band-order-
        // reversing leader rewrites the whole-video SUM signature,
        // the gap this operator closes
        val leader = Seq.fill(2)((0 until 4).map(j =>
          rgb(123 + j * 5, 45 + j * 3, 200 + j * 7)))
        def avi(frames: Seq[Seq[Int]]) =
          VideoCodec.encodeAviBands(32, 32, frames, scale = 1, rate = 25)
        Seq(
          MediaRecord(g * 10, "video", avi(orig), none),
          MediaRecord(g * 10 + 1, "video", avi(leader ++ orig), none),
          MediaRecord(g * 10 + 2, "video", avi(other), none))
      }
    Multimodal.videoTemporalNearDups(media, threshold = 0.5, maxDt = 4)
      .orderBy("id_a", "id_b")
  }

  // Frame hash h(g, clip, i) from the band formulas (k=0 original
  // colors, k=1 the distinct clip's, k=2 the g-independent title-card
  // leader); landmarks = DISTINCT (ha, hb, dt<=4) per clip; exact
  // count-based Jaccard over the landmark sets. Same signed-64 band
  // masks as the image oracle.
  val videoTemporalDedupSql: String =
    """WITH src AS (
      |  SELECT doc_id AS g, 0 AS clip, i, i AS s, 0 AS k
      |    FROM documents, range(8) r(i) WHERE doc_id < 40
      |  UNION ALL
      |  SELECT doc_id, 1, i, i - 2, CASE WHEN i < 2 THEN 2 ELSE 0 END
      |    FROM documents, range(10) r(i) WHERE doc_id < 40
      |  UNION ALL
      |  SELECT doc_id, 2, i, i, 1
      |    FROM documents, range(8) r(i) WHERE doc_id < 40),
      |q AS (SELECT g, clip, i, j,
      |    CASE k
      |      WHEN 0 THEN 299*((g*37 + s*91 + j*37)%256)
      |        + 587*((g*59 + s*129 + j*119)%256) + 114*((g*83 + s*67 + j*93)%256)
      |      WHEN 1 THEN 299*((g*41 + s*113 + j*53)%256)
      |        + 587*((g*61 + s*141 + j*87)%256) + 114*((g*89 + s*79 + j*101)%256)
      |      ELSE 299*(123 + j*5) + 587*(45 + j*3) + 114*(200 + j*7)
      |      END AS ql
      |  FROM src, range(4) b(j)),
      |qs AS (SELECT g, clip, i, j, ql,
      |    SUM(ql) OVER (PARTITION BY g, clip, i) AS t FROM q),
      |h AS (SELECT g, clip, i,
      |    CAST(SUM(CASE WHEN 4*ql > t
      |         THEN CASE j WHEN 0 THEN 65535
      |                     WHEN 1 THEN 4294901760
      |                     WHEN 2 THEN 281470681743360
      |                     ELSE -281474976710656 END
      |         ELSE 0 END) AS BIGINT) AS fh
      |  FROM qs GROUP BY 1, 2, 3),
      |lmd AS (SELECT DISTINCT a.g*10 + a.clip AS media_id,
      |    a.fh AS ha, b.fh AS hb, b.i - a.i AS dt
      |  FROM h a JOIN h b ON a.g = b.g AND a.clip = b.clip
      |    AND b.i > a.i AND b.i - a.i <= 4),
      |cnt AS (SELECT media_id, COUNT(*) AS n FROM lmd GROUP BY 1),
      |inter AS (SELECT a.media_id AS id_a, b.media_id AS id_b,
      |    COUNT(*) AS ic
      |  FROM lmd a JOIN lmd b ON a.ha = b.ha AND a.hb = b.hb
      |    AND a.dt = b.dt AND a.media_id < b.media_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b,
      |  CAST(ic AS DOUBLE) / (ca.n + cb.n - ic) AS overlap
      |FROM inter
      |JOIN cnt ca ON ca.media_id = id_a
      |JOIN cnt cb ON cb.media_id = id_b
      |WHERE CAST(ic AS DOUBLE) / (ca.n + cb.n - ic) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

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
      "q_image_phash_dedup" -> (imagePhashDedup _, imagePhashDedupSql),
      "q_video_phash_dedup" -> (videoPhashDedup _, videoPhashDedupSql),
      "q_audio_phash_dedup" -> (audioPhashDedup _, audioPhashDedupSql),
      "q_media_screen" -> (mediaScreen _, mediaScreenSql),
      "q_media_screen_mih" -> (mediaScreenMih _, mediaScreenMihSql),
      "q_media_screen_stream" -> (mediaScreenStream _, mediaScreenStreamSql),
      "q_audio_spectral_dedup" -> (audioSpectralDedup _, audioSpectralDedupSql),
      "q_video_temporal_dedup" -> (videoTemporalDedup _, videoTemporalDedupSql),
      "q_multimodal_meta" -> (multimodalMeta _, multimodalMetaSql),
      "q_multimodal_audio" -> (multimodalAudio _, multimodalAudioSql),
      "q_multimodal_timeline" -> (multimodalTimeline _, multimodalTimelineSql))
}
