package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Correctness burden for the hashed-n-gram linear quality classifier
  * beyond the q_quality_classifier hash gate (which pins Spark ==
  * DuckDB on the corpus fixture bit-for-bit but says nothing about
  * whether the model CLASSIFIES):
  *  1. on a planted-vocabulary fixture the trained model separates
  *     perfectly — train accuracy 100% AND holdout generalization
  *     (unseen docs drawn from the same two vocabularies);
  *  2. the native `graft_quality_score` expression equals the
  *     composed explode + broadcast-join + re-aggregate scorer on
  *     every edge row (empty text, punctuation-only, single token,
  *     NULL text, case folding, unicode separators);
  *  3. the JVM bucket twin equals the Spark conv(md5) bucket column
  *     (the three-engine hash contract the oracle relies on);
  *  4. labels outside {+1, −1} fail loudly in-plan. */
class QualityClassifierSpec extends SparkTestBase {

  import spark.implicits._

  // planted vocabularies with zero overlap: "good" prose words vs
  // "bad" spam words; deterministic round-robin doc generator
  private val goodV = Vector("clear", "concise", "prose", "measured",
    "detailed", "analysis", "method", "result", "evidence", "careful")
  private val badV = Vector("buy", "click", "free", "winner", "casino",
    "pills", "offer", "cheap", "deal", "instant")
  private def doc(v: Vector[String], seed: Int, len: Int): String =
    (0 until len).map(i => v((seed * 7 + i * 3) % v.length))
      .mkString(" ")

  private lazy val labeled = (
    (0 until 30).map(i => (i.toLong, doc(goodV, i, 12), 1)) ++
    (0 until 30).map(i => (100L + i, doc(badV, i, 12), -1))
  ).toDF("doc_id", "text", "label")

  private lazy val holdout = (
    (50 until 60).map(i => (i.toLong, doc(goodV, i, 9), 1)) ++
    (150 until 160).map(i => (i.toLong, doc(badV, i, 9), -1))
  ).toDF("doc_id", "text", "label")

  test("planted fixture: 100% train accuracy and holdout " +
      "generalization (the model actually classifies — the hash gate " +
      "alone only proves determinism)") {
    val w = QualityClassifier.train(labeled, col("text"), col("label"))
    def acc(df: org.apache.spark.sql.DataFrame): Double = {
      val scored = QualityClassifier.score(df, "doc_id", col("text"), w)
        .join(df.select("doc_id", "label"), "doc_id")
        .select(col("pred") === (col("label") === 1)).as[Boolean]
        .collect()
      scored.count(identity).toDouble / scored.length
    }
    assert(acc(labeled) == 1.0, "train accuracy must be 100% on " +
      "disjoint planted vocabularies")
    assert(acc(holdout) == 1.0, "holdout docs from the same " +
      "vocabularies must generalize")
    // scores are symmetric in sign structure: every good doc > 0,
    // every bad doc < 0 (not just != — the margin is real)
    val s = QualityClassifier.score(labeled, "doc_id", col("text"), w)
      .join(labeled.select("doc_id", "label"), "doc_id")
      .select("label", "score").as[(Int, Long)].collect()
    assert(s.forall { case (y, sc) => if (y == 1) sc > 0 else sc < 0 })
  }

  test("native graft_quality_score == composed explode-join scorer on " +
      "edge rows: empty, punctuation-only, single token, NULL text, " +
      "case folding, unicode separators, repeated features") {
    val edge = Seq(
      (1L, "clear concise prose"),
      (2L, ""),
      (3L, "!!! ... ---"),
      (4L, "word"),
      (5L, null.asInstanceOf[String]),
      (6L, "CLEAR Concise PROSE"),
      (7L, "café au lait naïve résumé"),
      (8L, "spam spam spam spam"),
      (9L, "a1 2b c3d 4"),
      (10L, "tab\tand\nnewline  double  space")
    ).toDF("doc_id", "text")
    val w = QualityClassifier.train(labeled, col("text"), col("label"))
    val native = QualityClassifier.score(edge, "doc_id", col("text"), w)
      .select("doc_id", "score", "pred")
      .as[(Long, Long, Boolean)].collect().toSet
    val composed = QualityClassifier
      .scoreComposed(edge, "doc_id", col("text"), w)
      .select("doc_id", "score", "pred")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(native == composed)
    // case folding: 1 and 6 tokenize identically
    val byId = native.map(t => t._1 -> t._2).toMap
    assert(byId(1L) == byId(6L), "lower() must fold before tokenizing")
    assert(byId(2L) == 0L && byId(3L) == 0L && byId(5L) == 0L,
      "no-token and NULL docs score 0")
  }

  test("subword char-grams (charN=3) separate the suffix-obfuscated " +
      "holdout that word features miss — the fastText subword claim, " +
      "planted (r17 verdict #8)") {
    // every token altered by a one-char suffix: zero WORD-feature
    // overlap with training, but most boundary-marked char 3-grams
    // survive — the transliteration/obfuscation shape of web spam
    def obf(v: Vector[String]): Vector[String] = v.map(_ + "x")
    val obfuscated = (
      (200 until 210).map(i => (i.toLong, doc(obf(goodV), i, 9), 1)) ++
      (300 until 310).map(i => (i.toLong, doc(obf(badV), i, 9), -1))
    ).toDF("doc_id", "text", "label")
    def acc(w: org.apache.spark.sql.DataFrame, charN: Int): Double = {
      val scored = QualityClassifier
        .score(obfuscated, "doc_id", col("text"), w, charN = charN)
        .join(obfuscated.select("doc_id", "label"), "doc_id")
        .select(col("pred") === (col("label") === 1)).as[Boolean]
        .collect()
      scored.count(identity).toDouble / scored.length
    }
    val wWord = QualityClassifier.train(labeled, col("text"), col("label"))
    val wSub = QualityClassifier.train(labeled, col("text"), col("label"),
      charN = 3)
    assert(acc(wSub, 3) == 1.0,
      "the subword model must classify the obfuscated docs perfectly")
    assert(acc(wWord, 0) < 1.0,
      "word features alone must NOT separate them (or the fixture " +
        "proves nothing)")
  }

  test("native graft_quality_score(text, w, 3) == composed subword " +
      "scorer on edge rows (short tokens, empty, NULL, unicode)") {
    val edge = Seq(
      (1L, "clear concise prose"),
      (2L, ""),
      (3L, "a b c"), // 1-char tokens: marked form exactly one window
      (4L, null.asInstanceOf[String]),
      (5L, "café au lait"),
      (6L, "a1 2b c3d 4")
    ).toDF("doc_id", "text")
    val w = QualityClassifier.train(labeled, col("text"), col("label"),
      charN = 3)
    val native = QualityClassifier
      .score(edge, "doc_id", col("text"), w, charN = 3)
      .select("doc_id", "score", "pred")
      .as[(Long, Long, Boolean)].collect().toSet
    val composed = QualityClassifier
      .scoreComposed(edge, "doc_id", col("text"), w, charN = 3)
      .select("doc_id", "score", "pred")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(native == composed)
  }

  test("JVM bucket twin == Spark conv(md5) bucket (the cross-engine " +
      "hash contract the DuckDB oracle replays)") {
    val feats = Seq("clear", "clear concise", "a", "1", "z9 q2",
      "café", "long multi word feature string")
    val fromSpark = feats.toDF("f")
      .select(col("f"), QualityClassifier.bucket(col("f"), 4096).as("b"))
      .as[(String, Long)].collect().toMap
    for (f <- feats)
      assert(graft.plans.ClassifierOps.bucket(f, 4096).toLong ==
        fromSpark(f), s"feature '$f'")
  }

  test("labels outside {+1, -1} fail loudly in-plan") {
    val bad = Seq((1L, "clear prose", 0)).toDF("doc_id", "text", "label")
    val ex = intercept[Exception] {
      QualityClassifier.train(bad, col("text"), col("label"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("label must be +1 or -1")),
      ex.toString)
  }
}
