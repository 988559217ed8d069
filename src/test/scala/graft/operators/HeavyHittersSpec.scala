package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** SpaceSaving guarantees: every value with true count > N/m is
  * present, every reported count overestimates within its error —
  * under single-partition determinism AND arbitrary-merge parallelism. */
class HeavyHittersSpec extends SparkTestBase {

  import spark.implicits._

  // Zipf-ish planted stream: value v_i occurs ~1000/i times, plus a
  // long tail of singletons. N ~ 3000+2000, heavy line at m=10.
  private lazy val stream: Seq[String] = {
    val head = (1 to 20).flatMap(i => Seq.fill(1000 / i)(s"v$i"))
    val tail = (1 to 2000).map(i => s"t$i")
    // deterministic interleave, adversarial enough for eviction churn
    (head ++ tail).zipWithIndex
      .sortBy { case (_, ix) => (ix * 2654435761L) % 4999 }
      .map(_._1)
  }

  private def exact: Map[String, Long] =
    stream.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("values above the N/m line always surface, counts overestimate") {
    val n = stream.size.toLong
    for (parts <- Seq(1, 7)) {
      val df = stream.toDF("term").repartition(parts)
      val got = HeavyHitters.sketchTopK(df, col("term"), m = 10)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val heavy = exact.filter { case (_, c) => c * 10 > n }
      assert(heavy.nonEmpty, "fixture must have heavy hitters")
      heavy.foreach { case (term, c) =>
        assert(got.contains(term), s"missing heavy hitter $term ($parts parts)")
        val (approx, err) = got(term)
        assert(approx >= c, s"$term undercounted: $approx < $c")
        assert(approx - err <= c, s"$term error bound broken")
      }
      assert(got.size <= 10)
    }
  }

  test("single-partition summary is exact for distinct values <= m") {
    val df = Seq("a", "b", "a", "c", "a", "b").toDF("term").coalesce(1)
    val got = HeavyHitters.sketchTopK(df, col("term"), m = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == Set(("a", 3L, 0L), ("b", 2L, 0L), ("c", 1L, 0L)))
    // ranked by count desc, then term
    assert(got.head == (("a", 3L, 0L)))
  }

  test("merge keeps the overestimate invariant when a side is full") {
    val ss = new HeavyHitters.SpaceSaving(2)
    val b1 = Seq("x", "x", "y").foldLeft(ss.zero)(ss.reduce) // full: x2 y1
    val b2 = Seq("z", "z", "z").foldLeft(ss.zero)(ss.reduce) // z3 (not full)
    val m12 = ss.merge(b1, b2)
    // z absent from full b1 -> floor 1 added as count AND error
    val asMap = m12
    assert(asMap("z")._1 >= 3L)
    assert(asMap("z")._1 - asMap("z")._2 <= 3L)
  }

  test("merge floors are per-side: evicted key on ONE full side never undercounts") {
    // d was seen once in stream1 then evicted (floor1=2); stream2 has
    // d 3 times and is NOT full (floor2=0). True d count = 4. Using
    // the wrong side's floor for the absent key would merge d to 3.
    val ss = new HeavyHitters.SpaceSaving(2)
    val b1 = Seq("d", "a", "a", "b", "b").foldLeft(ss.zero)(ss.reduce)
    assert(!b1.contains("d") && b1("a") == ((2L, 0L)) && b1("b") == ((3L, 1L)))
    val b2 = Seq("d", "d", "d").foldLeft(ss.zero)(ss.reduce)
    for (merged <- Seq(ss.merge(b1, b2), ss.merge(b2, b1))) {
      val (c, e) = merged("d")
      assert(c >= 4L, s"d undercounted: $c < true 4")
      assert(c - e <= 4L, s"d error bound broken: $c - $e > 4")
    }
  }
}
