package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkTestBase {

  import spark.implicits._

  // 4 docs: rare term in doc 1 only; common term everywhere; doc 4
  // contains neither query term.
  lazy val corpus = Seq(
    (1L, "alpha beta beta gamma"),
    (2L, "beta beta beta beta"),
    (3L, "beta gamma gamma gamma"),
    (4L, "delta delta delta delta")
  ).toDF("doc_id", "text")

  test("bm25 ranks the rare-term doc first and drops no-term docs") {
    val r = Retrieval.bm25TopK(corpus, "doc_id", col("text"),
      Seq("alpha", "beta"), k = 10).collect()
    // doc 4 has no query term -> score 0 -> excluded
    assert(r.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // rare "alpha" (df=1) dominates common "beta" (df=3)
    assert(r.head.getLong(0) == 1L)
    // descending scores, ties impossible here
    val scores = r.map(_.getDouble(2))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("bm25 score matches the closed-form formula") {
    val r = Retrieval.bm25TopK(corpus, "doc_id", col("text"),
        Seq("beta"), k = 10)
      .collect().map(row => row.getLong(0) -> row.getDouble(2)).toMap
    // n=4, df=3, avgdl=4, dl=4 for every doc
    val idf = math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
    def s(tf: Double) =
      BigDecimal(idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * 4.0 / 4.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(1L) == s(2))
    assert(r(2L) == s(4))
    assert(r(3L) == s(1))
  }

  test("bm25 respects k and breaks exact ties by doc_id") {
    val tied = Seq(
      (10L, "beta beta"), (11L, "beta beta"), (12L, "beta beta")
    ).toDF("doc_id", "text")
    val r = Retrieval.bm25TopK(tied, "doc_id", col("text"),
      Seq("beta"), k = 2).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(10L, 11L))
  }
}
