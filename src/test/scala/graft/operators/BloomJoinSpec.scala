package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bloom-prefiltered anti join: result parity with the plain anti
  * join is the contract — the blooms may only shrink the exact-join
  * inputs, never change the answer. */
class BloomJoinSpec extends SparkTestBase {

  import spark.implicits._

  // keys 1..500 incoming (plus a null-key row); history holds 200..700
  private lazy val incoming =
    ((1L to 500L).map(i => (Option(i), s"p$i")) :+
      ((None: Option[Long], "p-null"))).toDF("k", "payload")
  private lazy val history =
    (200L to 700L).map(i => (i, s"h$i")).toDF("hk", "hpayload")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "payload").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq

  test("bloom anti join is row-identical to the plain anti join") {
    val got = BloomJoin.antiJoinBloom(incoming, "k", history, "hk",
      expectedHistoryItems = 1000, expectedCandidateItems = 1000)
    val want = incoming.join(history.select(col("hk").as("k")),
      Seq("k"), "left_anti")
    assert(rows(got) == rows(want))
    // sanity on content: 1..199 survive, 200..500 drop, null survives
    assert(rows(got).map(_._1) == (-1L +: (1L to 199L)).sorted)
  }

  test("mightContain has no false negatives over the inserted keys") {
    val bloom = BloomJoin.bloomOf(history, col("hk"), 1000)
    assert(history.filter(BloomJoin.mightContain(bloom, col("hk")))
      .count() == history.count())
  }

  test("empty or all-null history keeps every incoming row") {
    val got = BloomJoin.antiJoinBloom(incoming, "k",
      history.filter(col("hk") < 0), "hk", 10, 10)
    assert(rows(got) == rows(incoming))
  }

  test("disjoint key ranges skip the exact join yet stay exact") {
    val far = (10000L to 10100L).map(i => (i, s"h$i")).toDF("hk", "hp")
    val got = BloomJoin.antiJoinBloom(incoming, "k", far, "hk", 200, 200)
    assert(rows(got) == rows(incoming))
  }

  test("optimalNumBits matches the closed form") {
    // 1e6 items at 1% -> 9585059 bits (9.6 bits/key)
    assert(BloomJoin.optimalNumBits(1000000L, 0.01) == 9585059L)
    assertThrows[IllegalArgumentException](
      BloomJoin.optimalNumBits(0, 0.01))
    assertThrows[IllegalArgumentException](
      BloomJoin.optimalNumBits(10, 1.0))
  }
}
