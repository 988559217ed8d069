package graft.query

import graft.SparkTestBase

/** approx_count_distinct: the HLL estimate must land within its
  * documented error bound of the exact count — the check an oracle
  * can't do (engine-specific sketches). */
class ApproxSpec extends SparkTestBase {

  // default rsd 0.05 is one standard deviation, not a bound — 15% ~ 3σ
  test("approx distinct within 15% of exact on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val approx = CoreQueries.approxDistinct(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(org.apache.spark.sql.functions.countDistinct("o_custkey"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex < 0.15, s"$k: approx $ap vs exact $ex")
    }
  }
}
