package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DriftSpec extends SparkTestBase {
  import spark.implicits._

  test("ksStatistic computes the exact scaled ECDF gap on a hand fixture") {
    // A = {1, 2, 3}, B = {3, 4, 5}; nA = nB = 3.
    // cumA*nB - cumB*nA over v: 1→3, 2→6, 3→6(9-3), 4→3, 5→0
    // max = 6 first attained at v = 2; ks = 6/9
    val df = Seq((1, true), (2, true), (3, true),
      (3, false), (4, false), (5, false)).toDF("v", "a")
    val r = Drift.ksStatistic(df, col("v"), col("a")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == ((3L, 3L)))
    assert(r.getInt(2) == 2)       // ks_at: smallest argmax value
    assert(r.getLong(3) == 6L)     // ks_num
    assert(r.getDouble(4) == 6.0 / 9.0)
  }

  test("ksStatistic matches a scipy-style reference on random samples") {
    val rnd = new scala.util.Random(11)
    val a = Seq.fill(80)(rnd.nextInt(20))
    val b = Seq.fill(50)(rnd.nextInt(20) + 3) // shifted slice
    val rows = a.map((_, true)) ++ b.map((_, false))
    val r = Drift.ksStatistic(rows.toDF("v", "a"), col("v"), col("a"))
      .collect()(0)
    // reference: exact max over the pooled support
    val support = (a ++ b).distinct.sorted
    val expected = support.map { v =>
      math.abs(a.count(_ <= v).toLong * b.size - b.count(_ <= v).toLong * a.size)
    }.max
    assert(r.getLong(3) == expected)
    assert(r.getDouble(4) == expected.toDouble / (a.size.toLong * b.size))
  }

  test("identical distributions give ks_num 0") {
    val rows = (1 to 10).flatMap(v => Seq((v, true), (v, false)))
    val r = Drift.ksStatistic(rows.toDF("v", "a"), col("v"), col("a"))
      .collect()(0)
    assert(r.getLong(3) == 0L)
  }

  test("ksStatistic FAILS LOUDLY past the distinct-value cardinality " +
      "bound (the continuous-column misuse), and passes at the bound") {
    val rows = (1 to 50).map(v => (v, v % 2 == 0)).toDF("v", "a")
    // 50 distinct values, bound 10 -> the in-plan assert fires
    val e = intercept[Exception] {
      Drift.ksStatistic(rows, col("v"), col("a"),
        maxDistinctValues = 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("Discretize")),
      s"expected the pre-bucketing instruction, got: ${msgs(e)}")
    // exactly at the bound: identical result to the unbounded form
    val bounded = Drift.ksStatistic(rows, col("v"), col("a"),
      maxDistinctValues = 50).collect()(0)
    val free = Drift.ksStatistic(rows, col("v"), col("a")).collect()(0)
    assert(bounded.toSeq === free.toSeq)
  }

  test("tokenRateDiff ranks by the exact cross-multiplied rate gap") {
    // A: [x x y], B: [x y y y]; nA=3, nB=4.
    // x: 2*4 - 1*3 = 5; y: 1*4 - 3*3 = -5; z absent.
    val df = Seq((Seq("x", "x", "y"), true), (Seq("x", "y", "y", "y"), false))
      .toDF("toks", "a")
    val out = Drift.tokenRateDiff(df, col("toks"), col("a"), topK = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    // |5| ties: token asc breaks it — "x" before "y"
    assert(out == Seq(("x", 2L, 1L, 5L), ("y", 1L, 3L, -5L)))
  }

  test("tokenRateDiff topK truncates after the deterministic order") {
    val df = Seq((Seq("a", "b", "c"), true), (Seq("c", "d"), false))
      .toDF("toks", "a")
    val out = Drift.tokenRateDiff(df, col("toks"), col("a"), topK = 2)
      .as[(String, Long, Long, Long)].collect().toSeq
    // nA=3, nB=2: a: 1*2-0*3=2; b: 2; c: 1*2-1*3=-1; d: 0*2-1*3=-3
    // order by |diff| desc, token asc: d(3), then a(2) before b(2)
    assert(out.map(_._1) == Seq("d", "a"))
  }

  test("cusumDaily: sustained shift alarms, on-baseline days do not") {
    // key a, 3 baseline periods of total 10 (base = 30, D = 3),
    // slack 1: on-baseline days accumulate nothing; a +10/day shift
    // builds 27 per day; a low day drains but persistence holds
    val rows = Seq(
      ("a", "d01", 10.0), ("a", "d02", 10.0), ("a", "d03", 10.0),
      ("a", "d04", 11.0), ("a", "d05", 11.0),
      ("a", "d06", 20.0), ("a", "d07", 20.0), ("a", "d08", 20.0),
      ("a", "d09", 5.0),
      // key b stays flat throughout: never alarms
      ("b", "d01", 7.0), ("b", "d02", 7.0), ("b", "d03", 7.0),
      ("b", "d04", 7.0), ("b", "d05", 7.0))
      .toDF("k", "p", "v")
    val got = Drift.cusumDaily(rows, col("v"), col("p"), col("k"),
        baselineDays = 3, slack = 1L, threshold = 20L)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._4, r._5))).toMap
    // baseline days: s = max(0, 3*10 - 30 - 3) = 0
    for (d <- Seq("d01", "d02", "d03"))
      assert(got(("a", d)) == ((0L, false)), d)
    // +1 days: 3*11 - 33 = 0 still
    assert(got(("a", "d04")) == ((0L, false)))
    assert(got(("a", "d05")) == ((0L, false)))
    // shift: +27 per day; alarm once s > 3*20 = 60
    assert(got(("a", "d06")) == ((27L, false)))
    assert(got(("a", "d07")) == ((54L, false)))
    assert(got(("a", "d08")) == ((81L, true)))
    // drain day: 81 + 15 - 33 = 63 — still above the line
    assert(got(("a", "d09")) == ((63L, true)))
    // flat key: identically zero
    assert(got.keys.filter(_._1 == "b")
      .forall(k => got(k) == ((0L, false))))
  }

  test("cusumDaily scans in TYPED period order, not string order") {
    // integer periods 1..12: string order would visit 1,10,11,12,2,…
    // and mis-accumulate; typed order must see the shift on days
    // 10-12 AFTER the flat days 1-9 (review r10 finding)
    val rows = ((1 to 9).map(d => ("k", d, 10.0)) ++
      (10 to 12).map(d => ("k", d, 30.0))).toDF("k", "p", "v")
    val got = Drift.cusumDaily(rows, col("v"), col("p"), col("k"),
        baselineDays = 3, slack = 0L, threshold = 25L)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => r._2 -> r._4).toMap
    // base = 30 (days 1..3 in TYPED order); days 1..9: 3*10-30 = 0;
    // days 10..12: +60 each -> 60, 120, 180
    for (d <- 1 to 9) assert(got(d.toString) == 0L, s"day $d")
    assert(got("10") == 60L && got("11") == 120L && got("12") == 180L)
  }
}
