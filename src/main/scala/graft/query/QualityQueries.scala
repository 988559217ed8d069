package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Drift, Sampling, TextAnalysis}

/** Statistical-quality and split-hygiene queries over `documents` —
  * the curation steps between dedup and packing: corpus-trained LM
  * perplexity bucketing (CCNet shape), the leakage-free
  * cluster-aware train/val/test split, PMI collocations, and
  * nucleus top-p selection. Split out of [[TextQueries]]
  * (the round-7 monolith guideline) like [[MediaQueries]]/
  * [[VectorQueries]].
  *
  * Everything is integer-exact by construction (bit-cost LM, md5
  * coins), so every query here carries a full rows+schema+hash
  * oracle. */
object QualityQueries {

  import TextQueries.{coinSql, docs}

  // ---- corpus-trained bigram LM quality buckets ----

  /** CCNet-style head/middle/tail quality bucketing, self-trained:
    * the bit-cost bigram LM ([[TextAnalysis.trainBitCostLm]]) is
    * trained on the corpus itself, every document is scored in whole
    * coded bits, and exact corpus terciles of the quantized
    * bits-per-bigram rate assign the buckets — all in integer
    * arithmetic, so the oracle replays training, scoring, and
    * thresholds bit-for-bit. At sf0.01 the terciles split 500 docs
    * 167/167/166 (measured — the score distribution is well-spread,
    * not degenerate). */
  def lmQuality(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val lm = TextAnalysis.trainBitCostLm(d, col("text"))
    val scored = TextAnalysis.lmScoreBits(d, "doc_id", col("text"), lm)
    TextAnalysis.bitRateBuckets(scored)
      .select("doc_id", "bits", "n_bigrams", "bucket")
      .orderBy("doc_id")
  }

  private val lmNormalizeSql: String =
    """regexp_replace(regexp_replace(lower(text), '[\t\n\f\r]', ' ', 'g'),
      |                   '[^a-z0-9 ]', '_', 'g')""".stripMargin

  private val bigramListSql: String =
    "unnest([substr(s, CAST(i AS INT), 2) FOR i IN range(1, length(s))])"

  /** Tail shared by both LM oracles: quantized key, per-key counts,
    * integer terciles (3*cum >= N is cum >= ceil(N/3)), bucketing. */
  private val lmBucketTailSql: String =
    """k AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS c FROM sc GROUP BY 1),
      |cum AS (SELECT key, CAST(SUM(c) OVER (ORDER BY key) AS BIGINT) AS cum,
      |    (SELECT CAST(SUM(c) AS BIGINT) FROM k) AS n FROM k),
      |th AS (SELECT MIN(CASE WHEN cum*3 >= n THEN key END) AS k1,
      |              MIN(CASE WHEN cum*3 >= 2*n THEN key END) AS k2 FROM cum)
      |SELECT doc_id, bits, n_bigrams,
      |  CASE WHEN key <= k1 THEN 'head' WHEN key <= k2 THEN 'middle'
      |       ELSE 'tail' END AS bucket
      |FROM sc, th ORDER BY doc_id""".stripMargin

  val lmQualitySql: String =
    s"""WITH nrm AS (SELECT doc_id, $lmNormalizeSql AS s FROM documents),
      |bg AS (SELECT doc_id, $bigramListSql AS bigram FROM nrm),
      |lmc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
      |        FROM bg GROUP BY 1),
      |lm AS (SELECT bigram,
      |    CAST(length(bin((SELECT CAST(SUM(cnt) AS BIGINT) FROM lmc)
      |                    // cnt)) - 1 AS BIGINT) AS bits
      |  FROM lmc),
      |ds AS (SELECT b.doc_id, CAST(SUM(l.bits) AS BIGINT) AS bits,
      |    CAST(COUNT(*) AS BIGINT) AS n_bigrams
      |  FROM bg b JOIN lm l USING (bigram) GROUP BY 1),
      |sc AS (SELECT d.doc_id, COALESCE(s.bits, 0) AS bits,
      |    COALESCE(s.n_bigrams, 0) AS n_bigrams,
      |    CASE WHEN COALESCE(s.n_bigrams, 0) = 0 THEN 9223372036854775807
      |         ELSE s.bits * ${TextAnalysis.LmKeyScale} // s.n_bigrams
      |    END AS key
      |  FROM documents d LEFT JOIN ds s USING (doc_id)),
      |$lmBucketTailSql""".stripMargin

  /** The CROSS-corpus face of the LM (CCNet proper trains on a clean
    * reference corpus and scores the crawl): the model sees only
    * even-doc_id documents, every document is scored — so the
    * unseen-bigram fallback path (1 bit above the rarest seen bigram)
    * is exercised under the hash gate, not just spec'd. */
  def lmQualityCross(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val lm = TextAnalysis.trainBitCostLm(
      d.filter(col("doc_id") % 2 === 0), col("text"))
    val scored = TextAnalysis.lmScoreBits(d, "doc_id", col("text"), lm)
    TextAnalysis.bitRateBuckets(scored)
      .select("doc_id", "bits", "n_bigrams", "bucket")
      .orderBy("doc_id")
  }

  val lmQualityCrossSql: String =
    s"""WITH nrm AS (SELECT doc_id, $lmNormalizeSql AS s FROM documents),
      |bg AS (SELECT doc_id, $bigramListSql AS bigram FROM nrm),
      |lmc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
      |        FROM bg WHERE doc_id % 2 = 0 GROUP BY 1),
      |lm AS (SELECT bigram,
      |    CAST(length(bin((SELECT CAST(SUM(cnt) AS BIGINT) FROM lmc)
      |                    // cnt)) - 1 AS BIGINT) AS bits
      |  FROM lmc),
      |fb AS (SELECT COALESCE(MAX(bits), 0) + 1 AS fb FROM lm),
      |ds AS (SELECT b.doc_id,
      |    CAST(SUM(COALESCE(l.bits, (SELECT fb FROM fb))) AS BIGINT) AS bits,
      |    CAST(COUNT(*) AS BIGINT) AS n_bigrams
      |  FROM bg b LEFT JOIN lm l USING (bigram) GROUP BY 1),
      |sc AS (SELECT d.doc_id, COALESCE(s.bits, 0) AS bits,
      |    COALESCE(s.n_bigrams, 0) AS n_bigrams,
      |    CASE WHEN COALESCE(s.n_bigrams, 0) = 0 THEN 9223372036854775807
      |         ELSE s.bits * ${TextAnalysis.LmKeyScale} // s.n_bigrams
      |    END AS key
      |  FROM documents d LEFT JOIN ds s USING (doc_id)),
      |$lmBucketTailSql""".stripMargin

  // ---- leakage-free cluster-aware split ----

  /** Train/val/test split where near-duplicates NEVER straddle
    * splits: minhash near-dup pairs -> connected components
    * ([[Dedup.nearDupClusters]]) -> the md5 split coin is thrown for
    * the cluster representative ([[Sampling.leakFreeSplit]]), so a
    * whole near-dup family lands in one split. Same pair generation
    * and parameters as q_dedup_clusters, so the oracle reuses the
    * proven recursive-reachability CTE. */
  def splitLeakFree(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("doc_id") < 1000)
    val pairs = Dedup.minhashNearDups(d, "doc_id", col("text"),
      threshold = 0.9, numHashes = 16, bands = 16, shingleK = 2)
    val clusters = Dedup.nearDupClusters(pairs)
    Sampling.leakFreeSplit(d, col("doc_id"), clusters,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "cluster", "split")
      .orderBy("doc_id")
  }

  val splitLeakFreeSql: String = {
    val t = Seq(0.8, 0.9, 1.0).map(Sampling.hexThreshold)
    val coin = coinSql("cluster")
    s"""WITH RECURSIVE
      |${DedupQueries.clusterReachCte},
      |cl AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id),
      |j AS (SELECT d.doc_id, COALESCE(cl.cluster, d.doc_id) AS cluster
      |      FROM (SELECT doc_id FROM documents WHERE doc_id < 1000) d
      |      LEFT JOIN cl ON cl.id = d.doc_id)
      |SELECT doc_id, cluster,
      |  CASE WHEN $coin <= '${t(0)}' THEN 'train'
      |       WHEN $coin <= '${t(1)}' THEN 'val'
      |       WHEN $coin <= '${t(2)}' THEN 'test' END AS split
      |FROM j ORDER BY doc_id""".stripMargin
  }

  // ---- data-card corpus report ----

  /** The corpus summary a curation run publishes next to its output
    * (a "data card"): doc/token/char totals and char-length extrema
    * by source, by (source, lang), and overall — one GROUPING SETS
    * aggregate, integer-exact, one corpus scan. */
  def corpusReport(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir)
      .withColumn("n_tokens",
        TextAnalysis.tokenCount(col("text")).cast("long"))
      .createOrReplaceTempView("graft_docs_report")
    s.sql("""SELECT source, lang, count(*) AS n_docs,
            |  sum(n_tokens) AS n_tokens, sum(n_chars) AS sum_chars,
            |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
            |FROM graft_docs_report
            |GROUP BY GROUPING SETS ((source), (source, lang), ())
            |ORDER BY source ASC NULLS FIRST,
            |  lang ASC NULLS FIRST""".stripMargin)
  }

  val corpusReportSql: String =
    """SELECT source, lang, count(*) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
      |FROM documents
      |GROUP BY GROUPING SETS ((source), (source, lang), ())
      |ORDER BY source ASC NULLS FIRST, lang ASC NULLS FIRST""".stripMargin

  // ---- PMI collocations (exact integer scoring) ----

  /** Top-100 word-bigram collocations by micro-PMI —
    * `(((c_ab·10^6) div c_a) · N) div c_b`, the integer-division
    * associativity chosen so every intermediate fits a long up to
    * trillions of tokens (c_ab·10^6/c_a ≤ 10^6 before N enters).
    * Both engines evaluate the identical parenthesization, so the
    * score — and therefore the top-k boundary — is exact, not a
    * float-rounding coin flip. One shuffle for bigram counts, one
    * for unigram counts, a broadcast of the scalar N, and a
    * TakeOrdered top-k; at 100 TB nothing here materializes a global
    * sort. Low-count noise is cut at c_ab ≥ 5 (PMI's classic
    * rare-pair pathology). */
  def collocations(s: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokenize(col("text"))
    val d = docs(s, dir).select(toks.as("l"))
    val uni = d.select(explode(col("l")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val n = uni.agg(sum("c").as("n"))
    val bg = d.select(explode(zip_with(
        slice(col("l"), lit(1), size(col("l")) - 1),
        slice(col("l"), lit(2), size(col("l")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    bg.join(uni.select(col("tok").as("a"), col("c").as("c_a")), "a")
      .join(uni.select(col("tok").as("b"), col("c").as("c_b")), "b")
      .join(broadcast(n))
      .withColumn("score_micro",
        expr("(((c_ab * 1000000L) div c_a) * n) div c_b"))
      .select("a", "b", "c_ab", "c_a", "c_b", "score_micro")
      .orderBy(desc("score_micro"), asc("a"), asc("b"))
      .limit(100)
  }

  val collocationsSql: String =
    """WITH d AS (SELECT string_split(text, ' ') AS l FROM documents),
      |uni AS (SELECT unnest(l) AS tok FROM d),
      |uc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM uni GROUP BY 1),
      |n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uc),
      |bg AS (SELECT unnest([l[i] FOR i IN range(1, len(l))]) AS a,
      |              unnest([l[i + 1] FOR i IN range(1, len(l))]) AS b
      |       FROM d),
      |bc AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab FROM bg
      |       GROUP BY 1, 2 HAVING COUNT(*) >= 5)
      |SELECT bc.a, bc.b, bc.c_ab, ua.c AS c_a, ub.c AS c_b,
      |  CAST((((bc.c_ab * 1000000) // ua.c) * n.n) // ub.c AS BIGINT)
      |    AS score_micro
      |FROM bc JOIN uc ua ON ua.tok = bc.a
      |        JOIN uc ub ON ub.tok = bc.b, n
      |ORDER BY score_micro DESC, a ASC, b ASC LIMIT 100""".stripMargin

  // ---- nucleus (top-p) corpus selection ----

  /** Per-language top-p selection by character mass: rank documents
    * by `(n_chars desc, doc_id)` and keep the smallest prefix whose
    * cumulative mass reaches 80% of the language's total — the
    * nucleus-sampling shape applied to corpus curation (cut the long
    * tail, keep the bulk). Kept iff `(cum_before · 100) < (80 ·
    * total)` — all integer, so the cut point is exact. Runs on
    * [[graft.operators.Sampling.nucleusCut]] (r16): the prefix sum is
    * decomposed over (lang, n_chars) value classes so a hot language
    * never becomes one un-splittable window partition; the row-level
    * tie-rank window shuffles only the nucleus and partitions by tie
    * class. */
  def nucleusTopP(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.nucleusCut(
        docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars")),
        col("lang"), col("n_chars"), col("doc_id"), pct = 80)
      .select("doc_id", "lang", "n_chars", "cum")
      .orderBy("lang", "doc_id")

  val nucleusTopPSql: String =
    """WITH r AS (SELECT doc_id, lang, n_chars,
      |    CAST(SUM(n_chars) OVER (PARTITION BY lang
      |      ORDER BY n_chars DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum,
      |    CAST(SUM(n_chars) OVER (PARTITION BY lang) AS BIGINT) AS total
      |  FROM documents)
      |SELECT doc_id, lang, n_chars, cum FROM r
      |WHERE (cum - n_chars) * 100 < total * 80
      |ORDER BY lang, doc_id""".stripMargin

  // ---- frequent itemset pairs (Apriori k=2) ----

  /** Top-100 token pairs by document co-occurrence, with the Apriori
    * prune: a pair can only be frequent if both tokens are (the
    * monotonicity that makes itemset mining feasible at scale), so
    * the first pass keeps tokens in ≥ 20 documents and the within-
    * document self-join runs over survivors only. Join is per
    * document (shuffle on doc_id), counts are exact integers, and
    * the top-k boundary is fully tie-broken — one Apriori level,
    * the k=2 association-mining primitive. */
  def itemsetPairs(s: SparkSession, dir: String): DataFrame = {
    val minSup = 20
    val toks = docs(s, dir).select(col("doc_id"),
      explode(array_distinct(TextAnalysis.tokenize(col("text"))))
        .as("tok"))
    val freq = toks.groupBy("tok")
      .agg(count(lit(1)).as("df")).filter(col("df") >= minSup)
    val ft = toks.join(freq.select("tok"), Seq("tok"), "left_semi")
    ft.select(col("doc_id"), col("tok").as("a"))
      .join(ft.select(col("doc_id"), col("tok").as("b")), "doc_id")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSup)
      .orderBy(desc("support"), asc("a"), asc("b"))
      .limit(100)
  }

  val itemsetPairsSql: String =
    """WITH toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' '))
      |    AS tok FROM documents),
      |freq AS (SELECT tok FROM toks GROUP BY tok
      |  HAVING COUNT(*) >= 20),
      |ft AS (SELECT t.doc_id, t.tok FROM toks t JOIN freq USING (tok))
      |SELECT x.tok AS a, y.tok AS b, CAST(COUNT(*) AS BIGINT) AS support
      |FROM ft x JOIN ft y ON x.doc_id = y.doc_id AND x.tok < y.tok
      |GROUP BY 1, 2 HAVING COUNT(*) >= 20
      |ORDER BY support DESC, a ASC, b ASC LIMIT 100""".stripMargin

  // ---- winnowing fingerprints (MOSS) ----

  /** Winnowing fingerprint sets ([[TextAnalysis.winnowFingerprints]],
    * k=8 char grams, window w=16): the bounded-density local
    * fingerprinting primitive — any shared substring of length
    * ≥ 23 chars between two documents is guaranteed a shared
    * fingerprint. Emitted as (doc_id, n_fps, min_fp, max_fp) per
    * document to keep the gate row count bounded while still pinning
    * the SET (count + lexicographic extremes over md5 hex values —
    * a different set changes at least one of them with
    * overwhelming probability; the full set feeds dedup joins in
    * production). */
  def winnow(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowFingerprints(docs(s, dir), "doc_id",
        col("text"), k = 8, w = 16)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_fps"), min("fp").as("min_fp"),
        max("fp").as("max_fp"))
      .orderBy("doc_id")

  val winnowSql: String =
    """WITH pos AS (SELECT doc_id, text,
      |    unnest([i FOR i IN range(1, length(text) - 6)]) AS p
      |  FROM documents WHERE length(text) >= 8),
      |g AS (SELECT doc_id, p, md5(substr(text, CAST(p AS INT), 8)) AS h
      |  FROM pos),
      |mn AS (SELECT doc_id, p,
      |    MIN(h) OVER (PARTITION BY doc_id ORDER BY p
      |      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS fp
      |  FROM g),
      |fps AS (SELECT DISTINCT doc_id, fp FROM mn WHERE p >= 16)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps,
      |  MIN(fp) AS min_fp, MAX(fp) AS max_fp
      |FROM fps GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- two-sample corpus drift screens (exact-integer statistics) ----

  /** Exact two-sample KS ([[graft.operators.Drift.ksStatistic]])
    * between the `en` slice and the rest, over the discrete `n_chars`
    * length distribution — "did this source/snapshot shift the length
    * profile?". The decision quantities (cross-multiplied ECDF gaps)
    * stay integers end-to-end; the one float column is a single
    * division of exact longs, bit-identical across engines. */
  def driftKs(s: SparkSession, dir: String): DataFrame =
    Drift.ksStatistic(docs(s, dir), col("n_chars"), col("lang") === "en")

  val driftKsSql: String =
    """WITH per AS (SELECT n_chars AS v,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |  FROM documents GROUP BY 1),
      |cum AS (SELECT v,
      |    SUM(ca) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumA,
      |    SUM(cb) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumB,
      |    SUM(ca) OVER () AS n_a, SUM(cb) OVER () AS n_b
      |  FROM per)
      |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  v AS ks_at,
      |  CAST(ABS(cumA * n_b - cumB * n_a) AS BIGINT) AS ks_num,
      |  CAST(ABS(cumA * n_b - cumB * n_a) AS DOUBLE)
      |    / CAST(n_a * n_b AS DOUBLE) AS ks
      |FROM cum ORDER BY ks_num DESC, ks_at ASC LIMIT 1""".stripMargin

  /** Token-rate drift screen ([[graft.operators.Drift.tokenRateDiff]]):
    * the 40 adjacent-token bigrams whose share of the slice's bigram
    * mass moved most between the `en` slice and the rest, ranked by
    * the exact 2×2 determinant |cnt_a·nB − cnt_b·nA| (the integer
    * core of a chi-squared screen). Bigram OCCURRENCES, not unigrams:
    * the corpus vocabulary is 31 tokens (a top-40 unigram screen
    * would just return the whole vocabulary), while the observed
    * bigram space is ~31² — a real ranking problem. Deterministic
    * total order: |det| desc, token asc — token is unique per row. */
  def driftTokens(s: SparkSession, dir: String): DataFrame = {
    val l = TextAnalysis.tokenize(col("text"))
    val bigrams = zip_with(
      slice(l, lit(1), size(l) - 1), slice(l, lit(2), size(l) - 1),
      (a, b) => concat(a, lit(" "), b))
    Drift.tokenRateDiff(docs(s, dir), bigrams,
      col("lang") === "en", topK = 40)
  }

  val driftTokensSql: String =
    """WITH d AS (SELECT string_split(text, ' ') AS l, lang FROM documents),
      |tok AS (SELECT unnest([l[i] || ' ' || l[i+1]
      |      FOR i IN range(1, len(l))]) AS token,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a
      |  FROM d),
      |per AS (SELECT token, CAST(SUM(a) AS BIGINT) AS cnt_a,
      |    CAST(COUNT(*) - SUM(a) AS BIGINT) AS cnt_b
      |  FROM tok GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt_a) AS BIGINT) AS n_a,
      |    CAST(SUM(cnt_b) AS BIGINT) AS n_b FROM per)
      |SELECT token, cnt_a, cnt_b,
      |  cnt_a * n_b - cnt_b * n_a AS diff_num
      |FROM per, tot
      |ORDER BY ABS(cnt_a * n_b - cnt_b * n_a) DESC, token ASC
      |LIMIT 40""".stripMargin

  /** PSI drift screen ([[graft.operators.Drift.psiFixedBuckets]]):
    * event `value` distribution of purchases vs everything else, ten
    * fixed 50-wide buckets, +1 Laplace smoothing, per-bucket terms in
    * integer micro-units so the PSI total is an exact integer sum.
    * The oracle replays the identical bucket/smooth/ln/round chain. */
  def driftPsi(s: SparkSession, dir: String): DataFrame =
    Drift.psiFixedBuckets(
        graft.sources.Tables.load(s, dir, "events"),
        col("value"), col("event_type") === "purchase",
        bucketWidth = 50.0, nBuckets = 10)
      .orderBy("bucket")

  val driftPsiSql: String =
    """WITH c AS (SELECT
      |    greatest(least(CAST(floor(value / 50.0) AS BIGINT), 9), 0)
      |      AS bucket,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c_a,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
      |      AS BIGINT) AS c_b
      |  FROM events GROUP BY 1),
      |f AS (SELECT r.range AS bucket, COALESCE(c.c_a, 0) AS c_a,
      |    COALESCE(c.c_b, 0) AS c_b
      |  FROM range(10) r LEFT JOIN c ON c.bucket = r.range),
      |t AS (SELECT bucket, c_a, c_b,
      |    CAST(SUM(c_a) OVER () AS BIGINT) AS n_a,
      |    CAST(SUM(c_b) OVER () AS BIGINT) AS n_b
      |  FROM f),
      |m AS (SELECT bucket, c_a, c_b, n_a, n_b,
      |    CAST(round(((c_a + 1.0) / (n_a + 10.0)
      |                 - (c_b + 1.0) / (n_b + 10.0))
      |      * ln(((c_a + 1.0) / (n_a + 10.0))
      |           / ((c_b + 1.0) / (n_b + 10.0)))
      |      * 1000000.0, 0) AS BIGINT) AS term_micro
      |  FROM t)
      |SELECT bucket, c_a, c_b, n_a, n_b, term_micro,
      |  CAST(SUM(term_micro) OVER () AS BIGINT) AS psi_micro
      |FROM m ORDER BY bucket""".stripMargin

  /** ROLLING drift dashboard ([[Drift.rollingPsi]]): PSI of each
    * day's event-value distribution against the pooled first-week
    * baseline — one corpus scan to a (day, bucket) frame, baseline
    * broadcast back over it, per-day terms on the bounded frame.
    * Smoothing/rounding arithmetic is q_drift_psi's, already
    * certified; this gate adds the per-period composition. */
  def driftRollingPsi(s: SparkSession, dir: String): DataFrame =
    Drift.rollingPsi(graft.sources.Tables.loadEventsTs(s, dir),
        col("value"), date_format(col("ets"), "yyyy-MM-dd"),
        baselineDays = 7, bucketWidth = 50.0, nBuckets = 10)
      .select(col("period"), col("n_period"), col("psi_micro"))
      .orderBy("period")

  val driftRollingPsiSql: String =
    """WITH c AS (SELECT
      |    strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d')
      |      AS period,
      |    greatest(least(CAST(floor(value / 50.0) AS BIGINT), 9), 0)
      |      AS bucket,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |cut AS (SELECT max(period) AS cut FROM
      |  (SELECT DISTINCT period FROM c ORDER BY period LIMIT 7)),
      |b AS (SELECT bucket, CAST(SUM(c) AS BIGINT) AS c_b
      |  FROM c, cut WHERE period <= cut GROUP BY 1),
      |spine AS (SELECT DISTINCT c.period, r.range AS bucket
      |  FROM c, range(10) r),
      |f AS (SELECT s.period, s.bucket, COALESCE(c.c, 0) AS c_a,
      |    COALESCE(b.c_b, 0) AS c_b
      |  FROM spine s
      |  LEFT JOIN c ON c.period = s.period AND c.bucket = s.bucket
      |  LEFT JOIN b ON b.bucket = s.bucket),
      |t AS (SELECT period, c_a, c_b,
      |    CAST(SUM(c_a) OVER (PARTITION BY period) AS BIGINT) AS n_a,
      |    CAST(SUM(c_b) OVER (PARTITION BY period) AS BIGINT) AS n_b
      |  FROM f),
      |m AS (SELECT period, n_a,
      |    CAST(round(((c_a + 1.0) / (n_a + 10.0)
      |                 - (c_b + 1.0) / (n_b + 10.0))
      |      * ln(((c_a + 1.0) / (n_a + 10.0))
      |           / ((c_b + 1.0) / (n_b + 10.0)))
      |      * 1000000.0, 0) AS BIGINT) AS term_micro
      |  FROM t)
      |SELECT period, CAST(MAX(n_a) AS BIGINT) AS n_period,
      |  CAST(SUM(term_micro) AS BIGINT) AS psi_micro
      |FROM m GROUP BY period ORDER BY period""".stripMargin


  /** Sequential mean-shift detection ([[Drift.cusumDaily]]): one-sided
    * CUSUM of each event type's daily value total against its exact
    * first-week baseline, slack 200/day, alarm at cumulative excess
    * 1500 — the level-shift monitor beside q_drift_rolling_psi's
    * shape monitor. The max(0,·)-clamped recursion is non-associative
    * (no window function), so the oracle replays the identical
    * integer sequence as a recursive CTE over day row_numbers. */
  def driftCusum(s: SparkSession, dir: String): DataFrame =
    Drift.cusumDaily(graft.sources.Tables.loadEventsTs(s, dir),
        col("value"), date_format(col("ets"), "yyyy-MM-dd"),
        col("event_type"), baselineDays = 7, slack = 200L,
        threshold = 1500L)
      .orderBy("key", "period")

  val driftCusumSql: String =
    """WITH RECURSIVE t AS (SELECT event_type AS key,
      |    strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d')
      |      AS period,
      |    CAST(SUM(CAST(floor(value) AS BIGINT)) AS BIGINT) AS total
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT key, period, total,
      |    ROW_NUMBER() OVER (PARTITION BY key ORDER BY period) AS rn
      |  FROM t),
      |b AS (SELECT key,
      |    CAST(SUM(CASE WHEN rn <= 7 THEN total END) AS BIGINT) AS base
      |  FROM r GROUP BY 1),
      |c AS (SELECT r.key, r.period, r.total, r.rn,
      |    greatest(CAST(0 AS BIGINT),
      |      7 * r.total - b.base - 7 * 200) AS s
      |  FROM r JOIN b USING (key) WHERE r.rn = 1
      |  UNION ALL
      |  SELECT r.key, r.period, r.total, r.rn,
      |    greatest(CAST(0 AS BIGINT),
      |      c.s + 7 * r.total - b.base - 7 * 200)
      |  FROM c JOIN r ON r.key = c.key AND r.rn = c.rn + 1
      |  JOIN b ON b.key = r.key)
      |SELECT key, period, total, CAST(s AS BIGINT) AS s_scaled,
      |  s > 7 * 1500 AS alarm
      |FROM c ORDER BY key, period""".stripMargin

  // ---- hashed-n-gram linear quality classifier ----

  /** fastText-style discriminative quality filter under the FULL hash
    * gate (r16 verdict #5): a linear model over hashed word
    * unigram+bigram features
    * ([[graft.operators.QualityClassifier]]) trains on the even-id
    * half of the corpus (label +1 for 'en', −1 otherwise — a
    * stand-in labeled fixture; the SPEC proves real separation on a
    * planted-vocabulary fixture) in exact integer arithmetic
    * (cross-multiplied class-rate weights, md5-mod-4096 hashing
    * trick), then every document scores through the NATIVE one-pass
    * `graft_quality_score` expression. The oracle replays
    * tokenization, feature hashing, training, and scoring closed-form
    * in SQL, so the raw LONG scores — not a derived boolean — are
    * hash-gated bit-for-bit. */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.QualityClassifier
    val d = docs(s, dir)
    val label = when(col("lang") === "en", 1).otherwise(-1)
    val w = QualityClassifier.train(
      d.filter(col("doc_id") % 2 === 0), col("text"), label)
    QualityClassifier.score(d, "doc_id", col("text"), w)
      .orderBy("doc_id")
  }

  val qualityClassifierSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
      |                t -> t <> '') AS ts
      |  FROM documents),
      |feats AS (
      |  SELECT doc_id, unnest(list_distinct(
      |      ts || [ts[i] || ' ' || ts[i+1] FOR i IN range(1, len(ts))]
      |    )) AS f
      |  FROM toks),
      |fb AS (SELECT doc_id,
      |    CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % 4096 AS b
      |  FROM feats),
      |tr AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
      |  FROM documents WHERE doc_id % 2 = 0),
      |n AS (SELECT
      |    CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS npos,
      |    CAST(SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS nneg
      |  FROM tr),
      |w AS (SELECT fb.b,
      |    CAST(SUM(CASE WHEN tr.y = 1 THEN 1 ELSE 0 END)
      |           * (SELECT nneg FROM n)
      |       - SUM(CASE WHEN tr.y = -1 THEN 1 ELSE 0 END)
      |           * (SELECT npos FROM n) AS BIGINT) AS w
      |  FROM fb JOIN tr USING (doc_id) GROUP BY 1),
      |sc AS (SELECT d.doc_id,
      |    CAST(COALESCE(SUM(w.w), 0) AS BIGINT) AS score
      |  FROM documents d
      |  LEFT JOIN fb ON fb.doc_id = d.doc_id
      |  LEFT JOIN w ON w.b = fb.b
      |  GROUP BY 1)
      |SELECT doc_id, score, score > 0 AS pred
      |FROM sc ORDER BY doc_id""".stripMargin

  /** The SUBWORD variant under the same full hash gate (r17 verdict
    * #8 — fastText's char-n-gram trick, Bojanowski 2017): features
    * are word unigrams ∪ bigrams ∪ the char 3-grams of each token
    * wrapped in `<`…`>` boundary markers, the robustness layer for
    * the transliteration/obfuscation web-corpus quality filters face
    * ("fr33 c4sino" shares no word feature with its clean form but
    * plenty of char grams — QualityClassifierSpec proves the planted
    * separation word features miss). Same integer-exact training and
    * the same NATIVE one-pass scorer (`graft_quality_score(text, w,
    * 3)`); the oracle replays gram extraction with a nested list
    * comprehension and the raw LONG scores hash-gate bit-for-bit. */
  def qualityClassifierSub(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.QualityClassifier
    val d = docs(s, dir)
    val label = when(col("lang") === "en", 1).otherwise(-1)
    val w = QualityClassifier.train(
      d.filter(col("doc_id") % 2 === 0), col("text"), label, charN = 3)
    QualityClassifier.score(d, "doc_id", col("text"), w, charN = 3)
      .orderBy("doc_id")
  }

  val qualityClassifierSubSql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
      |                t -> t <> '') AS ts
      |  FROM documents),
      |feats AS (
      |  SELECT doc_id, unnest(list_distinct(
      |      ts || [ts[i] || ' ' || ts[i+1] FOR i IN range(1, len(ts))]
      |      || flatten([[substr('<' || t || '>', i, 3)
      |                   FOR i IN range(1, len(t) + 1)] FOR t IN ts])
      |    )) AS f
      |  FROM toks),
      |fb AS (SELECT doc_id,
      |    CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % 4096 AS b
      |  FROM feats),
      |tr AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y
      |  FROM documents WHERE doc_id % 2 = 0),
      |n AS (SELECT
      |    CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS npos,
      |    CAST(SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS nneg
      |  FROM tr),
      |w AS (SELECT fb.b,
      |    CAST(SUM(CASE WHEN tr.y = 1 THEN 1 ELSE 0 END)
      |           * (SELECT nneg FROM n)
      |       - SUM(CASE WHEN tr.y = -1 THEN 1 ELSE 0 END)
      |           * (SELECT npos FROM n) AS BIGINT) AS w
      |  FROM fb JOIN tr USING (doc_id) GROUP BY 1),
      |sc AS (SELECT d.doc_id,
      |    CAST(COALESCE(SUM(w.w), 0) AS BIGINT) AS score
      |  FROM documents d
      |  LEFT JOIN fb ON fb.doc_id = d.doc_id
      |  LEFT JOIN w ON w.b = fb.b
      |  GROUP BY 1)
      |SELECT doc_id, score, score > 0 AS pred
      |FROM sc ORDER BY doc_id""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_quality_classifier" ->
      (qualityClassifier _, qualityClassifierSql),
    "q_quality_classifier_sub" ->
      (qualityClassifierSub _, qualityClassifierSubSql),
    "q_drift_psi" -> (driftPsi _, driftPsiSql),
    "q_drift_rolling_psi" -> (driftRollingPsi _, driftRollingPsiSql),
    "q_drift_cusum" -> (driftCusum _, driftCusumSql),
    "q_lm_quality" -> (lmQuality _, lmQualitySql),
    "q_lm_quality_cross" -> (lmQualityCross _, lmQualityCrossSql),
    "q_split_leakfree" -> (splitLeakFree _, splitLeakFreeSql),
    "q_corpus_report" -> (corpusReport _, corpusReportSql),
    "q_collocations" -> (collocations _, collocationsSql),
    "q_nucleus_topp" -> (nucleusTopP _, nucleusTopPSql),
    "q_winnow" -> (winnow _, winnowSql),
    "q_itemset_pairs" -> (itemsetPairs _, itemsetPairsSql),
    "q_drift_ks" -> (driftKs _, driftKsSql),
    "q_drift_tokens" -> (driftTokens _, driftTokensSql))
}
