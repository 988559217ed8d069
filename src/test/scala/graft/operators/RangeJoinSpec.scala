package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import scala.util.Random

class RangeJoinSpec extends SparkTestBase {

  import spark.implicits._

  // deterministic disjoint ranges with gaps between them
  private lazy val dim = {
    val rnd = new Random(7)
    var cursor = 0L
    (1 to 50).map { i =>
      val start = cursor + rnd.nextInt(1000) + 1
      val end = start + rnd.nextInt(5000)
      cursor = end
      (start, end, s"r$i")
    }.toDF("start_ip", "end_ip", "tag")
  }

  private lazy val fact = {
    val rnd = new Random(11)
    (1 to 2000).map(i => (i.toLong, rnd.nextLong(300000L)))
      .toDF("id", "key")
  }

  test("bucketed range join == plain between left join") {
    for (bits <- Seq(8, 12, 16)) {
      val got = RangeJoin.bucketed(fact, dim, col("key"),
          "start_ip", "end_ip", bits)
        .select("id", "key", "tag").collect()
        .map(r => (r.getLong(0), Option(r.getString(2)))).toMap
      val want = fact.join(broadcast(dim),
          col("key").between(col("start_ip"), col("end_ip")), "left")
        .select("id", "tag").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
      assert(got == want, s"bits=$bits")
      assert(got.size == 2000, "left join must keep every fact row once")
    }
  }

  test("bucketed range join plans as hash join, not nested loop") {
    val df = RangeJoin.bucketed(fact, dim, col("key"), "start_ip", "end_ip")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("signed keys and zero-straddling ranges match the between join") {
    val sdim = Seq(
      (-5000L, -1000L, "neg"),
      (-500L, 500L, "straddle"),     // range crossing zero
      (1000L, 2000L, "pos")
    ).toDF("start_ip", "end_ip", "tag")
    val sfact = Seq(-6000L, -3000L, -400L, 0L, 400L, 700L, 1500L, 9000L)
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("id", "key")
    for (bits <- Seq(4, 8, 16)) {
      val got = RangeJoin.bucketed(sfact, sdim, col("key"),
          "start_ip", "end_ip", bits)
        .select("id", "tag").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
      val want = sfact.join(broadcast(sdim),
          col("key").between(col("start_ip"), col("end_ip")), "left")
        .select("id", "tag").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
      assert(got == want, s"bits=$bits")
      assert(got.size == 8)
      assert(got(1L).contains("neg") && got(2L).contains("straddle"))
    }
  }

  test("most-specific match wins over nested overlapping ranges") {
    // nested CIDR shape: /8 containing a /16 containing a /24
    val nested = Seq(
      (0L, (1L << 24) - 1, "slash8"),
      (4096L, 4096L + (1L << 16) - 1, "slash16"),
      (4096L, 4096L + 255L, "slash24"),
      (900000L, 900100L, "tie_a"),     // equal-span overlap:
      (900000L, 900100L, "tie_b")      // start desc tie-break -> same
    ).toDF("start_ip", "end_ip", "tag")
    val keys = Seq(
      (1L, 4200L),        // inside all three -> slash24
      (2L, 4096L + 60000L), // inside /8 + /16 -> slash16
      (3L, 5000000L),     // inside /8 only... (5000000 < 2^24) -> slash8
      (4L, 900050L),      // equal-span tie
      (5L, 99999999L)     // no match
    ).toDF("id", "key")
    val got = RangeJoin.bucketedMostSpecific(keys, nested, col("key"),
        "start_ip", "end_ip", 8)
      .select("id", "tag").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toMap
    assert(got(1L).contains("slash24"))
    assert(got(2L).contains("slash16"))
    assert(got(3L).contains("slash8"))
    assert(got(4L).isDefined)  // deterministic pick between equal spans
    assert(got(5L).isEmpty)
    assert(got.size == 5, "exactly one row per fact key")
    // exactly one output row per fact row even where 3 ranges match
    assert(RangeJoin.bucketedMostSpecific(keys, nested, col("key"),
      "start_ip", "end_ip", 8).count() == 5)
  }

  test("range spanning many buckets still matches exactly once") {
    val wide = Seq((0L, 1000000L, "wide")).toDF("start_ip", "end_ip", "tag")
    val got = RangeJoin.bucketed(fact, wide, col("key"),
        "start_ip", "end_ip", 8)
      .filter(col("key") <= 1000000L)
    // every in-range key matches the single wide range exactly once
    assert(got.count() ==
      fact.filter(col("key") <= 1000000L).count())
    assert(got.filter(col("tag").isNull).count() == 0)
  }
}
