package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables

/** Training-data operators over `documents` / `embeddings`
  * (SURVEY §7.4 beyond-parity extensions): text analysis, dedup
  * family, similarity search. Oracle-checked where DuckDB can express
  * the same computation bit-deterministically; the LSH family entries
  * are Spark-only (driver records a rows-only check) and their
  * semantics are locked by specs instead. */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  // ---- text analysis (oracle) ----

  def textStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("__toks", TextAnalysis.tokenize(col("text")))
      .select(
        col("doc_id"),
        size(col("__toks")).as("n_tokens"),
        TextAnalysis.punctCount(col("text")).as("n_punct"),
        TextAnalysis.upperCount(col("text")).as("n_upper"),
        TextAnalysis.avgTokenLenFromTokens(col("__toks")).as("avg_token_len"))
      .orderBy("doc_id")

  val textStatsSql: String =
    """SELECT doc_id,
      |  len(string_split(text, ' ')) AS n_tokens,
      |  length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS n_punct,
      |  length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper,
      |  CASE WHEN len(string_split(text, ' ')) = 0 THEN 0.0
      |    ELSE CAST(list_sum(list_transform(string_split(text, ' '),
      |           t -> length(t))) AS DOUBLE) / len(string_split(text, ' '))
      |  END AS avg_token_len
      |FROM documents ORDER BY doc_id""".stripMargin

  def textQuality(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.stopwordRatio(col("text"), TextAnalysis.enStopwords)
        .as("stopword_ratio"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  val textQualitySql: String = {
    val stop = TextAnalysis.enStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
       |           FROM documents),
       |r AS (SELECT doc_id, text,
       |  CAST(len(toks) AS DOUBLE) AS n_tok,
       |  CASE WHEN len(toks) = 0 THEN 0.0
       |    ELSE CAST(len([x FOR x IN toks IF x IN ($stop)]) AS DOUBLE)
       |         / len(toks) END AS stopword_ratio,
       |  CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
       |       AS DOUBLE) AS n_punct,
       |  CAST(greatest(length(text), 1) AS DOUBLE) AS n_chars
       |  FROM t)
       |SELECT doc_id, stopword_ratio,
       |  least(n_tok / 50.0, 1.0) * 0.4 +
       |  least(stopword_ratio * 5.0, 1.0) * 0.4 +
       |  greatest(0.0, 1.0 - n_punct / n_chars * 10.0) * 0.2 AS quality
       |FROM r ORDER BY doc_id""".stripMargin
  }

  def tokenTotals(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long"))
          .as("total_tokens"))
      .orderBy("lang")

  val tokenTotalsSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---- dedup (exact: oracle; LSH family: rows-only + specs) ----

  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(docs(s, dir), "doc_id",
        concat_ws(" ", slice(TextAnalysis.tokenize(col("text")), 1, 5)))
      .orderBy("keep_id")

  val dedupExactSql: String =
    """SELECT array_to_string(string_split(text, ' ')[1:5], ' ') AS dedup_key,
      |  min(doc_id) AS keep_id, count(*) AS copies
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(
        docs(s, dir).filter(col("doc_id") < 40), "doc_id", col("text"), k = 1)
      .filter(col("jaccard") > 0.3)
      .orderBy("id_a", "id_b")

  val ngramJaccardPairsSql: String =
    """WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS sh
      |           FROM documents WHERE doc_id < 40)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CASE WHEN len(list_distinct(a.sh || b.sh)) = 0 THEN 0.0
      |    ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |         / len(list_distinct(a.sh || b.sh)) END AS jaccard
      |FROM t a JOIN t b ON a.doc_id < b.doc_id
      |WHERE CASE WHEN len(list_distinct(a.sh || b.sh)) = 0 THEN 0.0
      |    ELSE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |         / len(list_distinct(a.sh || b.sh)) END > 0.3
      |ORDER BY id_a, id_b""".stripMargin

  // Bigram shingles discriminate on this corpus (unigram Jaccard is
  // ~0.4 for ALL pairs — shared vocabulary); r=1 banding for recall.
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(docs(s, dir).filter(col("doc_id") < 1000),
        "doc_id", col("text"),
        threshold = 0.1, numHashes = 16, bands = 16, shingleK = 2)
      .orderBy("id_a", "id_b")

  // maxDist=8 -> 9-block banding with guaranteed recall at distance 8;
  // 16 would need 17 blocks of 3-4 bits (collision blowup at corpus
  // scale) for little extra signal on this corpus.
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDups(docs(s, dir), "doc_id", col("text"), maxDist = 8)
      .orderBy("id_a", "id_b")

  def langFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      TextAnalysis.langGuess(col("text")).as("lang_guess"),
      TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  // ---- similarity search ----

  def simBruteForce(s: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(
      embs(s, dir).filter(col("vec_id") < 100), "vec_id", "embedding", 50)

  val simBruteForceSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |           FROM embeddings WHERE vec_id < 100)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  list_dot_product(a.v, b.v) /
      |    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
      |    AS cos
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |ORDER BY cos DESC, id_a, id_b LIMIT 50""".stripMargin

  def simLsh(s: SparkSession, dir: String): DataFrame =
    Similarity.lshBucketTopK(
        embs(s, dir).filter(col("vec_id") < 200), "vec_id", "embedding",
        k = 5, numPlanes = 6)
      .select("query_id", "neighbor_id", "cos", "rank")
      .orderBy("query_id", "rank")

  /** Near-dup clustering (connected components) over brute-force
    * unigram-Jaccard pairs at 0.9 — this corpus yields one dense
    * ~130-doc cluster plus scattered twins, so the oracle (a DuckDB
    * recursive-CTE transitive closure) exercises multi-hop label
    * propagation, not just pair mirroring. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(
        docs(s, dir).filter(col("doc_id") < 300), "doc_id", col("text"),
        k = 1, minJaccard = 0.9)
    // dropped = the keep-one-per-cluster decision (clusterDropIds set)
    Dedup.nearDupClusters(pairs)
      .withColumn("dropped", col("id") =!= col("cluster"))
      .orderBy("id")
  }

  val dedupClustersSql: String =
    """WITH RECURSIVE
      |t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS sh
      |      FROM documents WHERE doc_id < 300),
      |p AS (SELECT a.doc_id AS ia, b.doc_id AS ib
      |      FROM t a JOIN t b ON a.doc_id < b.doc_id
      |      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |            / len(list_distinct(a.sh || b.sh)) >= 0.9),
      |e AS (SELECT ia AS a, ib AS b FROM p
      |      UNION SELECT ib, ia FROM p),
      |n AS (SELECT DISTINCT a AS id FROM e),
      |reach(id, r) AS (
      |  SELECT id, id FROM n
      |  UNION
      |  SELECT re.id, e.b FROM reach re JOIN e ON re.r = e.a)
      |SELECT id, min(r) AS cluster, id <> min(r) AS dropped
      |FROM reach GROUP BY id
      |ORDER BY id""".stripMargin

  /** Oracle-checked queries. */
  val withOracle: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_dedup_clusters" -> (dedupClusters _, dedupClustersSql),
    "q_text_stats" -> (textStats _, textStatsSql),
    "q_text_quality" -> (textQuality _, textQualitySql),
    "q_token_totals" -> (tokenTotals _, tokenTotalsSql),
    "q_dedup_exact" -> (dedupExact _, dedupExactSql),
    "q_ngram_jaccard" -> (ngramJaccardPairs _, ngramJaccardPairsSql),
    "q_sim_bruteforce" -> (simBruteForce _, simBruteForceSql))

  /** Spark-only entries (rows-only driver check; semantics spec-locked). */
  // the synthetic embeddings max out near cosine 0.51 — 0.4 captures
  // the genuinely-similar tail (threshold is caller policy on real data)
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDups(embs(s, dir), "vec_id", "embedding",
        threshold = 0.4, numPlanes = 6, tables = 4)
      .orderBy("id_a", "id_b")

  def simIvf(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(embs(s, dir).filter(col("vec_id") < 200),
        "vec_id", "embedding", k = 5, nlist = 8, nprobe = 2)
      .select("query_id", "neighbor_id", "cos", "rank")
      .orderBy("query_id", "rank")

  /** Multimodal plumbing under the driver contract: documents' text
    * bytes stand in for media payloads (no codecs in this container —
    * the STUB codec is deterministic), exercising the typed record
    * schema, the mapPartitions batch shape, frame sampling, and the
    * feature projection end-to-end. */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{length => strlen}
    val media = docs(s, dir).filter(col("doc_id") < 200).select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "video").otherwise("image").as("kind"),
      col("text").cast("binary").as("bytes"),
      struct(
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        (strlen(col("text")) * 10).cast("int").as("duration_ms"))
        .as("meta"))
    val feats = graft.operators.Multimodal.extractFeatures(
        graft.operators.Multimodal.asRecords(media)).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("feature").getItem(0).as("f0"))
    val frames = graft.operators.Multimodal.sampleFrames(
        graft.operators.Multimodal.asRecords(media), frames = 4).toDF()
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame_bytes"))).as("frame_bytes_total"))
    feats.join(frames, Seq("media_id"), "left")
      .orderBy("media_id")
  }

  val rowsOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_features" -> (multimodalFeatures _),
    "q_dedup_minhash" -> (dedupMinhash _),
    "q_dedup_simhash" -> (dedupSimhash _),
    "q_dedup_embedding" -> (dedupEmbedding _),
    "q_lang_fingerprint" -> (langFingerprint _),
    "q_sim_lsh" -> (simLsh _),
    "q_sim_ivf" -> (simIvf _))
}
