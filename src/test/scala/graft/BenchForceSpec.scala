package graft

import org.apache.spark.sql.functions._

/** Pins the bench forcing action (r14): every timing in Bench /
  * ScaleBench / Scale100 must evaluate the query's declared OUTPUT,
  * not the minimum plan that preserves cardinality. The two count()
  * holes that motivated the switch are certified here IN BOTH
  * DIRECTIONS — count() demonstrably skips the work (so a future
  * revert would fail this spec's premise, not silently re-open the
  * hole), and force() demonstrably does it. Sources are spark.range,
  * not LocalRelation: ConvertToLocalRelation evaluates projections at
  * OPTIMIZATION time and would fake the demonstration. */
class BenchForceSpec extends SparkTestBase {

  test("force() evaluates output expressions that count() prunes — " +
      "certified by an assert_true(false) column: count passes " +
      "silently, force throws") {
    val df = spark.range(3)
      .select(col("id"),
        // a poison output column: evaluating it ALWAYS throws. Under
        // count() Catalyst prunes it (cardinality needs no columns),
        // which is exactly why count() was the wrong timing action.
        assert_true(col("id") < 0).as("poison"))
    assert(df.count() == 3L,
      "count() silently skips the poison column — the r1-r13 hole")
    intercept[Exception] { Bench.force(df) }
  }

  test("force() executes unique-key left joins that count() " +
      "eliminates — the q_scrub_spans 0.48s-vs-16.6s hole") {
    val base = spark.range(3).select(col("id"),
      (col("id") * 2).as("v"))
    val report = base.groupBy("id")
      .agg(count(lit(1)).as("n"),
        // poison inside the aggregate: only evaluated if the join
        // (and with it the aggregate) actually runs
        max(assert_true(col("id") < 0).cast("int")).as("poison"))
    val q = base.join(report, Seq("id"), "left")
    // count(): the right side is keyed-unique, no columns referenced,
    // cardinality unchanged -> Catalyst removes the join AND the agg
    assert(q.count() == 3L,
      "count() eliminates the aggregated left-join side entirely")
    val optimized = q.groupBy().count().queryExecution.optimizedPlan
    assert(!optimized.toString.toLowerCase.contains("join"),
      s"expected the count() plan to have NO join:\n$optimized")
    // force(): the declared output includes the report columns
    intercept[Exception] { Bench.force(q) }
  }
}
