package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(iv: Seq[(Long, Long, Long)])
      : Set[(Long, Long, Long)] =
    (for {
      a <- iv; b <- iv if a._1 < b._1
      s = math.max(a._2, b._2); e = math.min(a._3, b._3) if s <= e
    } yield (a._1, b._1, e - s + 1)).toSet

  test("self overlap pairs equal brute force at EVERY bucket width " +
      "(credit rule: no duplicates, no misses)") {
    val rnd = new scala.util.Random(17)
    val iv = (1L to 120L).map { id =>
      val s = rnd.nextInt(300).toLong
      (id, s, s + rnd.nextInt(25).toLong)
    }
    val want = brute(iv)
    val df = iv.toDF("id", "s", "e")
    for (w <- Seq(1L, 5L, 16L, 64L, 1000L)) {
      val got = IntervalJoin.selfOverlapPairs(df, "id", "s", "e", w)
        .select("id_a", "id_b", "overlap")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.length == got.toSet.size, s"duplicates at w=$w")
      assert(got.toSet == want, s"w=$w")
    }
  }

  test("two-sided join: boundary touch counts, disjoint does not") {
    val l = Seq((1L, 10L, 20L), (2L, 0L, 5L)).toDF("id", "s", "e")
    val r = Seq((7L, 20L, 30L), (8L, 6L, 9L)).toDF("id", "s", "e")
    val got = IntervalJoin.overlapPairs(l, "id", "s", "e",
        r, "id", "s", "e", bucketWidth = 4L)
      .select("id_a", "id_b", "overlap")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSet
    // [10,20]x[20,30] touch at 20 -> overlap 1; [0,5] meets neither
    assert(got == Set((1L, 7L, 1L)))
  }

  test("a start > end row fails loudly, not silently empty") {
    val bad = Seq((1L, 9L, 3L)).toDF("id", "s", "e")
    val ex = intercept[Exception] {
      IntervalJoin.selfOverlapPairs(bad, "id", "s", "e", 4L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex).exists(_.contains("start <= end")), messages(ex))
  }
}
