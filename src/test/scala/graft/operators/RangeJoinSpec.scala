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
