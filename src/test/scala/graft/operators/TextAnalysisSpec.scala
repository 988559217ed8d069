package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {

  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.redactPii(col("t")))
      .collect()(0).getString(0)

  test("redactPii scrubs emails, phones, and IPv4 literals") {
    assert(redact("mail a.b+tag@sub.example.co.uk now") == "mail <EMAIL> now")
    assert(redact("call +44-123-4567 or +1-555-0000") ==
      "call <PHONE> or <PHONE>")
    assert(redact("host 192.168.0.1 and 10.0.255.7") ==
      "host <IP> and <IP>")
    assert(redact("a@b.com at 1.2.3.4 via +1-555-1234") ==
      "<EMAIL> at <IP> via <PHONE>")
    // no PII -> text unchanged (no accidental matches on word salad)
    val salad = "key agg row scan slow fast table value part hash"
    assert(redact(salad) == salad)
  }

  test("piiCounts reports per-kind match counts on the original text") {
    val r = Seq("a@b.com c@d.org at 1.2.3.4 via +1-555-1234").toDF("t")
      .select(TextAnalysis.piiCounts(col("t")).as("c"))
      .select("c.n_emails", "c.n_phones", "c.n_ips").collect()(0)
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 1, 1)))
  }

  test("repetitionSignals computes dominant-gram and duplication fractions") {
    val in = Seq(
      (1L, "a b a b a"),      // bigrams: ab, ba, ab, ba -> top (ab,2)/4
      (2L, "x y z w"),        // 3 distinct bigrams, no repetition
      (3L, "t t t t t")       // one gram repeated 4x
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(in, "doc_id", col("text"), n = 2)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3), x.getLong(4),
          x.getDouble(5), x.getDouble(6)))).toMap
    assert(r(1L) == ((4L, 2L, "b a", 2L, 0.5, 0.5)))
    assert(r(2L) == ((3L, 3L, "z w", 1L, 1.0 / 3, 0.0)))
    assert(r(3L) == ((4L, 1L, "t t", 4L, 1.0, 0.75)))
  }

  test("normalizeText composes, lowercases, and collapses whitespace") {
    def norm(s: String): String =
      Seq(s).toDF("t").select(TextAnalysis.normalizeText(col("t")))
        .collect()(0).getString(0)
    // decomposed e + U+0301 -> composed é; ANGSTROM SIGN -> å
    assert(norm("été") == "été")
    assert(norm("Å") == "å")
    assert(norm("  A   B  ") == "a b")
    // idempotent
    val once = norm("É  X")
    assert(norm(once) == once)
  }

  test("native repetition stats equal the explode+aggregate form on real docs") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    for (n <- Seq(1, 2, 3)) {
      val a = TextAnalysis.repetitionSignals(docs, "doc_id", col("text"), n)
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      val b = TextAnalysis.repetitionSignalsAgg(docs, "doc_id", col("text"), n)
        .collect().map(r => r.getLong(0) -> r.toSeq).toMap
      assert(a == b, s"n=$n")
    }
  }

  test("chunkTokens windows overlap by size-stride with a shorter tail") {
    // 10 tokens, size 4, stride 3 -> starts 0,3,6,9
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = TextAnalysis.chunkTokens(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", col("text"),
        size = 4, stride = 3)
      .select("chunk_ix", "chunk_text").collect()
      .map(r => r.getInt(0) -> r.getString(1)).sortBy(_._1)
    assert(got.toSeq == Seq(
      0 -> "t1 t2 t3 t4", 1 -> "t4 t5 t6 t7", 2 -> "t7 t8 t9 t10",
      3 -> "t10"))
    // every token of every document lands in at least one chunk, and
    // an empty doc still emits one (empty) chunk
    val empty = TextAnalysis.chunkTokens(
        Seq((2L, "")).toDF("doc_id", "text"), "doc_id", col("text"),
        size = 4, stride = 3).collect()
    assert(empty.length == 1 && empty(0).getString(2) == "")
    // NULL text -> one chunk with NULL chunk_text (distinguishable
    // from an empty document's single "" chunk)
    val nul = TextAnalysis.chunkTokens(
        Seq((3L, null: String)).toDF("doc_id", "text"), "doc_id",
        col("text"), size = 4, stride = 3).collect()
    assert(nul.length == 1 && nul(0).isNullAt(2))
  }

  test("repetitionSignals collapses short docs to the whole-text gram") {
    val r = TextAnalysis.repetitionSignals(
        Seq((1L, "solo")).toDF("doc_id", "text"), "doc_id", col("text"),
        n = 2).collect()(0)
    assert(r.getLong(1) == 1L && r.getString(3) == "solo")
    assert(r.getDouble(5) == 1.0 && r.getDouble(6) == 0.0)
  }

  // ---- bit-cost bigram LM ----

  test("lmNormalize folds to the fixed 38-symbol alphabet; lmBigrams edges") {
    val got = Seq("AbC\t9,x\n!").toDF("t")
      .select(TextAnalysis.lmNormalize(col("t"))).collect()(0).getString(0)
    assert(got == "abc 9_x _")
    def bigrams(s: String): Seq[String] =
      Seq(s).toDF("t").select(TextAnalysis.lmBigrams(col("t")))
        .collect()(0).getSeq[String](0)
    assert(bigrams("abc") == Seq("ab", "bc"))
    assert(bigrams("a").isEmpty && bigrams("").isEmpty)
    // null text -> null array -> scoring treats it as a no-bigram doc
    val nul = Seq((1L, null: String)).toDF("doc_id", "t")
    assert(nul.select(TextAnalysis.lmBigrams(col("t"))).collect()(0)
      .isNullAt(0))
    val sc = TextAnalysis.lmScoreBits(nul, "doc_id", col("t"),
      TextAnalysis.trainBitCostLm(Seq("ab").toDF("t"), col("t")))
      .collect()(0)
    assert(sc.getLong(1) == 0L && sc.getLong(2) == 0L)
  }

  test("trainBitCostLm costs bigrams at floor(log2(total/cnt)) exactly") {
    // corpus "aaab" + "ab": bigrams aa,aa,ab + ab -> cnt(aa)=2,
    // cnt(ab)=2, total=4 -> both cost floor(log2(4/2)) = 1 bit;
    // corpus "aaaab": aa x3, ab x1, total 4 -> aa: floor(log2(4/3))=0,
    // ab: floor(log2(4))=2
    val lm1 = TextAnalysis.trainBitCostLm(
        Seq("aaab", "ab").toDF("t"), col("t"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(lm1 == Map("aa" -> 1L, "ab" -> 1L))
    val lm2 = TextAnalysis.trainBitCostLm(Seq("aaaab").toDF("t"), col("t"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(lm2 == Map("aa" -> 0L, "ab" -> 2L))
  }

  test("lmScoreBits sums seen costs; unseen bigrams cost max+1") {
    val lm = TextAnalysis.trainBitCostLm(Seq("aaaab").toDF("t"), col("t"))
    val docs = Seq((1L, "aab"), (2L, "zz")).toDF("doc_id", "t")
    val got = TextAnalysis.lmScoreBits(docs, "doc_id", col("t"), lm)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // doc 1: aa(0) + ab(2) = 2 bits over 2 bigrams; doc 2: zz unseen
    // -> max(bits)=2 -> 3 bits
    assert(got == Map(1L -> ((2L, 2L)), 2L -> ((3L, 1L))))
  }

  test("native graft_bigram_costs equals the exploded scorer on messy text") {
    // covers: mixed case, digits, every whitespace fold, punctuation,
    // non-ASCII (routes the slow lowercase path), an empty doc, a
    // 1-char doc, a null doc, and unseen bigrams vs the tiny LM
    val docs = Seq(
      (1L, "AbC\t9,x\n!"), (2L, "the quick brown fox 42"),
      (3L, "Élève Über straße"), (4L, ""),
      (5L, "q"), (6L, null: String), (7L, "  \r\f  "),
      (8L, "ZZZZ unseen pairs 999")).toDF("doc_id", "t")
    val lm = TextAnalysis.trainBitCostLm(
      Seq("the quick", "a b c 42", "mixed_Case 9!").toDF("t"), col("t"))
    def collectScores(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    val native = collectScores(
      TextAnalysis.lmScoreBits(docs, "doc_id", col("t"), lm))
    val exploded = collectScores(
      TextAnalysis.lmScoreBitsExploded(docs, "doc_id", col("t"), lm))
    assert(native == exploded)
    assert(native(4L) == ((0L, 0L)) && native(6L) == ((0L, 0L)))
  }

  test("accumulator trainer equals the exploded trainer on messy docs") {
    val corpus = Seq("AbC\t9,x\n!", "the quick brown fox 42",
      "Élève Über straße", "", "q", null: String, "  \r\f  ",
      "zz zz zz 999").toDF("t")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val native = asMap(TextAnalysis.trainBitCostLm(corpus, col("t")))
    val exploded = asMap(
      TextAnalysis.trainBitCostLmExploded(corpus, col("t")))
    assert(native == exploded && native.nonEmpty)
    // the expression-side key derivation matches LmOps' inverse map
    native.keys.foreach { k =>
      assert(graft.plans.LmOps.bigramKey(
        graft.plans.LmOps.bigramIndex(k)) == k)
    }
  }

  test("bitRateBuckets cuts exact terciles; boundary keys share a bucket") {
    // 9 docs with strictly increasing rates -> 3/3/3
    val scored = (1L to 9L).map(i => (i, i, 1L))
      .toDF("doc_id", "bits", "n_bigrams")
    val b = TextAnalysis.bitRateBuckets(scored).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert((1L to 3L).forall(b(_) == "head") &&
      (4L to 6L).forall(b(_) == "middle") &&
      (7L to 9L).forall(b(_) == "tail"))
    // all-equal keys: every doc shares the boundary key -> one bucket
    val flat = (1L to 6L).map(i => (i, 5L, 1L))
      .toDF("doc_id", "bits", "n_bigrams")
    val fb = TextAnalysis.bitRateBuckets(flat).collect()
      .map(_.getString(4)).toSet
    assert(fb == Set("head"))
    // no-bigram docs take the worst key -> tail (never head)
    val mix = ((1L to 4L).map(i => (i, i, 1L)) :+ ((5L, 0L, 0L)))
      .toDF("doc_id", "bits", "n_bigrams")
    val mb = TextAnalysis.bitRateBuckets(mix).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(mb(5L) == "tail")
  }

  test("winnowing: shared >= w+k-1 substring guarantees a shared fp") {
    val shared = "The quick brown fox jumps!" // 26 chars >= 16+8-1
    val a = (1L, s"aaaa zzzz $shared qqqq pppp wwww dddd ffff gggg")
    val b = (2L, s"totally different prefix text $shared and a tail xx")
    val c = (3L, "no overlap here at all, completely distinct content!")
    val fps = TextAnalysis.winnowFingerprints(
        Seq(a, b, c).toDF("doc_id", "text"), "doc_id", col("text"),
        k = 8, w = 16)
      .as[(Long, String)].collect().groupBy(_._1)
      .map { case (d, xs) => d -> xs.map(_._2).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty, "planted overlap must share a fp")
    assert((fps(1L) & fps(3L)).isEmpty ||
      (fps(1L) & fps(3L)).size < (fps(1L) & fps(2L)).size)
  }

  test("winnowing density: |fps| well below gram count, never zero") {
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val fps = TextAnalysis.winnowFingerprints(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", col("text"),
        k = 8, w = 16).count()
    val grams = text.length - 7
    assert(fps > 0 && fps * 4 < grams,
      s"density off: $fps fps for $grams grams")
  }

  test("winnowing: docs shorter than one full window emit nothing") {
    val fps = TextAnalysis.winnowFingerprints(
        Seq((1L, "tiny text"), (2L, "")).toDF("doc_id", "text"),
        "doc_id", col("text"), k = 8, w = 16).count()
    assert(fps == 0)
  }

  test("native graft_winnow equals the window-shuffle form on random " +
      "multi-byte corpora — every (doc, fp) row, several (k, w)") {
    val rnd = new scala.util.Random(43)
    // small alphabet (forces repeated grams and value-dedup) + a
    // multi-byte character (UTF8String.substring is char-based; a
    // byte-based slip would shift every md5 after the first é)
    val alpha = "ab é"
    val docsSeq = (1L to 60L).map { id =>
      id -> (0 until 3 + rnd.nextInt(120))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    // boundary lengths: exactly one full window, one short of it
    val edge = Seq(900L -> "x" * (8 + 16 - 1), 901L -> "x" * (8 + 16 - 2))
    val df = (docsSeq ++ edge).toDF("doc_id", "text")
    for ((k, w) <- Seq((8, 16), (3, 4), (1, 1))) {
      val native = TextAnalysis.winnowFingerprints(
          df, "doc_id", col("text"), k, w)
        .as[(Long, String)].collect().toSet
      val windowed = TextAnalysis.winnowFingerprintsWindowed(
          df, "doc_id", col("text"), k, w)
        .as[(Long, String)].collect().toSet
      assert(native == windowed, s"k=$k w=$w")
    }
    // the boundary doc with exactly one full window emits exactly the
    // dedup of that window = one fp; one char shorter emits none
    val one = TextAnalysis.winnowFingerprints(
        edge.toDF("doc_id", "text"), "doc_id", col("text"), 8, 16)
      .as[(Long, String)].collect()
    assert(one.map(_._1).toSeq == Seq(900L))
  }
}
