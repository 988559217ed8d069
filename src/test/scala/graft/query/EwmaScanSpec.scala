package graft.query

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EwmaScanSpec extends SparkTestBase {
  import spark.implicits._

  /** Scalar reference of the exact integer recurrence. */
  private def reference(vs: Seq[Long], aN: Long, aD: Long,
                        scale: Long): Seq[Long] =
    vs.tail.scanLeft(vs.head * scale) { (s, v) =>
      (aN * v * scale + (aD - aN) * s) / aD
    }

  test("per-key scan replays the scalar recurrence in time order") {
    // rows deliberately out of order; ties on us broken by tie column
    val rows = Seq(
      (1L, 30L, 1L, 7L), (1L, 10L, 2L, 3L), (1L, 20L, 3L, 0L),
      (1L, 30L, 0L, 9L), // same us=30, lower tie -> before (30,1)
      (2L, 5L, 1L, 100L))
    val got = QueryOps.ewmaScan(rows.toDF("u", "t", "e", "x"),
        col("u"), col("t"), col("e"), col("x"), 30, 100)
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (r._2, r._3)).map(_._5).toSeq)
      .toMap
    val k1 = Seq(3L, 0L, 9L, 7L) // order: (10,2),(20,3),(30,0),(30,1)
    assert(got(1L) == reference(k1, 30, 100, 1000000L))
    assert(got(2L) == Seq(100L * 1000000L))
  }

  test("result is partition-count invariant") {
    val rows = (1 to 300).map(i =>
      ((i % 7).toLong, i.toLong, i.toLong, ((i * 13) % 50).toLong))
    def run(parts: Int) = QueryOps.ewmaScan(
        rows.toDF("u", "t", "e", "x").repartition(parts),
        col("u"), col("t"), col("e"), col("x"), 25, 100)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(run(1) == run(8))
  }

  test("negative values fail loudly (floor vs truncate divergence)") {
    val ex = intercept[Exception] {
      QueryOps.ewmaScan(Seq((1L, 1L, 1L, -5L)).toDF("u", "t", "e", "x"),
        col("u"), col("t"), col("e"), col("x"), 30, 100).collect()
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(ex).contains("non-negative"))
  }

  test("alpha edge cases: 0 freezes at the first value, 1 tracks input") {
    val vs = Seq(4L, 9L, 2L)
    val df = Seq((1L, 1L, 1L, 4L), (1L, 2L, 2L, 9L), (1L, 3L, 3L, 2L))
      .toDF("u", "t", "e", "x")
    val frozen = QueryOps.ewmaScan(df, col("u"), col("t"), col("e"),
        col("x"), 0, 100)
      .orderBy("us").as[(Long, Long, Long, Long, Long)].collect().map(_._5)
    assert(frozen.toSeq == Seq.fill(3)(4000000L))
    val tracking = QueryOps.ewmaScan(df, col("u"), col("t"), col("e"),
        col("x"), 100, 100)
      .orderBy("us").as[(Long, Long, Long, Long, Long)].collect().map(_._5)
    assert(tracking.toSeq == vs.map(_ * 1000000L))
  }
}
