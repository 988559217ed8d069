package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val df = Seq(
    (Some(1L), Some("a")), (Some(2L), None),
    (Some(2L), Some("b")), (None, Some("a")))
    .toDF("k", "s")

  test("profile computes nulls, exact distinct, and bounds in one pass") {
    val rows = Profiling.profile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
      .toMap
    assert(rows("k") == ((1L, 2L, "1", "2")))
    assert(rows("s") == ((1L, 2L, "a", "b")))
  }

  test("approx mode swaps in HLL distinct, everything else unchanged") {
    val rows = Profiling.profile(df, Seq("k"), exactDistinct = false)
      .collect().map(r => (r.getLong(1), r.getString(3), r.getString(4)))
    assert(rows.head == ((1L, "1", "2")))
  }

  test("topTerms ranks by tf desc then rarity then term") {
    val corpus = Seq(
      (1L, "apple apple apple common common rare"),
      (2L, "banana banana common common common apple"),
      (3L, "common cherry cherry cherry rare rare")).toDF("id", "text")
    val top = TextAnalysis.topTerms(corpus, "id", col("text"), 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._5).map(_._2).toSeq).toMap
    // doc 1: apple tf=3; common tf=2
    assert(top(1L) == Seq("apple", "common"))
    // doc 2: common tf=3; banana tf=2
    assert(top(2L) == Seq("common", "banana"))
    // doc 3: cherry tf=3; rare tf=2
    assert(top(3L) == Seq("cherry", "rare"))
  }

  test("topTerms rarity tie-break prefers the rarer term at equal tf") {
    val corpus = Seq(
      (1L, "x xx"), (2L, "x y"), (3L, "x z")).toDF("id", "text")
    // doc 1: tf(x)=tf(xx)=1; df(x)=3, df(xx)=1 -> xx first
    val top1 = TextAnalysis.topTerms(corpus, "id", col("text"), 1)
      .filter(col("doc_id") === 1).collect()(0).getString(1)
    assert(top1 == "xx")
  }

  test("topTerms df forms are identical: map-side agg+join (default, " +
      "r15 de-skew) vs the term-keyed window, incl. a planted stopword") {
    val rnd = new scala.util.Random(47)
    val corpus = (1L to 60L).map { id =>
      // "the" in every doc — the hot term whose window partition was
      // the whole corpus in the r13 window form
      val body = (0 until (3 + rnd.nextInt(12)))
        .map(_ => s"w${rnd.nextInt(15)}").mkString(" ")
      id -> s"the $body the"
    }.toDF("id", "text")
    def run(viaWindow: Boolean) =
      TextAnalysis.topTermsImpl(corpus, "id", col("text"), 3,
          dfViaWindow = viaWindow)
        .collect().map(r => (r.getLong(0), r.getInt(4)) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(run(viaWindow = false) === run(viaWindow = true))
  }
}
