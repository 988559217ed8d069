package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Pins the [[IntervalPlan]] sizing planner — the r12 promotion of the
  * interval-join skew footnote into code — on known distributions: the
  * width lands at the length quantile, the loud guard fires on BOTH
  * failure modes it documents (under-bucketed fan-out, planted hot
  * bucket) with the remedy named, passes the gate-shaped config, and
  * the whole path survives column names that need backticks (the
  * interpolated-SQL form it replaced broke on them). */
class IntervalPlanSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketWidthFor lands at the length quantile of a known " +
      "distribution") {
    // 90 intervals of length 5, 10 of length 100 -> p90 = 5
    val iv = ((1L to 90L).map(i => (i, i * 1000L, i * 1000L + 4L)) ++
      (91L to 100L).map(i => (i, i * 1000L, i * 1000L + 99L)))
      .toDF("id", "s", "e")
    assert(IntervalPlan.bucketWidthFor(iv, "s", "e") == 5L)
    // p100 picks the longest interval
    assert(IntervalPlan.bucketWidthFor(iv, "s", "e", 1.0) == 100L)
    // floored at 1 for degenerate (point) intervals
    val pts = Seq((1L, 7L, 7L)).toDF("id", "s", "e")
    assert(IntervalPlan.bucketWidthFor(pts, "s", "e") == 1L)
    val ex = intercept[IllegalArgumentException] {
      IntervalPlan.bucketWidthFor(iv.filter(col("id") < 0), "s", "e")
    }
    assert(ex.getMessage.contains("empty interval table"))
  }

  test("requireFit fires on an under-bucketed width, naming " +
      "bucketWidthFor and its suggested value") {
    // every interval has length 100; width 1 -> fan-out ~101 per row
    val iv = (1L to 50L).map(i => (i, i * 7L, i * 7L + 99L))
      .toDF("id", "s", "e")
    val ex = intercept[IllegalArgumentException] {
      IntervalPlan.requireFit(iv, "s", "e", iv, "s", "e", bucketWidth = 1L)
    }
    assert(ex.getMessage.contains("under-bucketed"), ex.getMessage)
    assert(ex.getMessage.contains("bucketWidthFor"), ex.getMessage)
    assert(ex.getMessage.contains("100"), ex.getMessage) // suggested width
  }

  test("requireFit fires on a planted hot bucket (true pile-up), " +
      "naming the AQE skew-split remedy; passes once the budget fits") {
    // 600 intervals all covering [0, 10]: at ANY width they co-register
    // in instant 0's bucket -> worst product 600*600 = 360k
    val pile = (1L to 600L).map(i => (i, 0L, 10L)).toDF("id", "s", "e")
    assert(IntervalPlan.hotBucketProduct(
      pile, "s", "e", pile, "s", "e", 16L) == 360000.0)
    val ex = intercept[IllegalArgumentException] {
      IntervalPlan.requireFit(pile, "s", "e", pile, "s", "e",
        bucketWidth = 16L, maxHotBucketProduct = 1e5)
    }
    assert(ex.getMessage.contains("hot bucket"), ex.getMessage)
    assert(ex.getMessage.contains("skew"), ex.getMessage)
    // same data, budget above the product: passes (fan-out is 1)
    IntervalPlan.requireFit(pile, "s", "e", pile, "s", "e",
      bucketWidth = 16L, maxHotBucketProduct = 1e6)
  }

  test("requireFit passes the gate-shaped config (spread intervals at " +
      "the p90-derived width) — the wired selfOverlapPairsAuto path") {
    val rnd = new scala.util.Random(23)
    val iv = (1L to 200L).map { id =>
      val s = rnd.nextInt(3000).toLong
      (id, s, s + rnd.nextInt(20).toLong)
    }
    val df = iv.toDF("id", "s", "e")
    val w = IntervalPlan.bucketWidthFor(df, "s", "e")
    IntervalPlan.requireFit(df, "s", "e", df, "s", "e", w) // must not throw
    // the auto path (check = true default) equals brute force
    val want = (for {
      a <- iv; b <- iv if a._1 < b._1
      s = math.max(a._2, b._2); e = math.min(a._3, b._3) if s <= e
    } yield (a._1, b._1, e - s + 1)).toSet
    val got = IntervalJoin.selfOverlapPairsAuto(df, "id", "s", "e")
      .select("id_a", "id_b", "overlap")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.toSet.size)
    assert(got.toSet == want)
    // planSelf (the checked path's sizing) agrees with the plain sizer
    assert(IntervalPlan.planSelf(df, "s", "e") == w)
  }

  test("the wired auto path itself fails loudly on a default-budget " +
      "pile-up (planSelf: max(n)^2 over one bucket aggregate)") {
    // 12k intervals all covering [0, 10]: hot product 12k^2 = 1.44e8
    // exceeds the 1e8 default before the join ever plans
    val pile = (1L to 12000L).map(i => (i, 0L, 10L)).toDF("id", "s", "e")
    val ex = intercept[IllegalArgumentException] {
      IntervalJoin.selfOverlapPairsAuto(pile, "id", "s", "e")
    }
    assert(ex.getMessage.contains("hot bucket"), ex.getMessage)
    assert(ex.getMessage.contains("skew"), ex.getMessage)
    // an explicitly unchecked call still plans (the caller's opt-out)
    assert(IntervalJoin
      .selfOverlapPairsAuto(pile, "id", "s", "e", check = false)
      .columns.contains("overlap"))
  }

  test("planSelf's fan-out denominator counts only rows with BOTH " +
      "bounds — a heavily-NULL table cannot dilute an under-bucketed " +
      "width past the guard (ADVICE r13)") {
    // non-null rows: 19 of length 1 (p90 -> width 1) + 1 of length
    // 1001 -> ~1020 registrations over 20 real rows = mean ~51.
    // 1000 NULL-bound rows produce ZERO registrations; the broken
    // count(*) denominator would see 1020/1020 = 1 and pass.
    val real = (1L to 19L).map(i => (Some(i * 5000L), Some(i * 5000L))) :+
      ((Some(0L), Some(1000L)))
    val nulls = (1L to 1000L).map(_ =>
      (None: Option[Long], None: Option[Long]))
    val iv = (real ++ nulls).toDF("s", "e")
    val ex = intercept[IllegalArgumentException] {
      IntervalPlan.planSelf(iv, "s", "e")
    }
    assert(ex.getMessage.contains("under-bucketed"), ex.getMessage)
    // the same non-null rows WITHOUT the null padding fail identically
    // (the nulls changed nothing about the real distribution)
    val ex2 = intercept[IllegalArgumentException] {
      IntervalPlan.planSelf(real.toDF("s", "e"), "s", "e")
    }
    assert(ex2.getMessage.contains("under-bucketed"), ex2.getMessage)
  }

  test("column names needing backticks pass through the planner " +
      "(Column arithmetic, not interpolated SQL)") {
    val iv = (1L to 40L).map(i => (i, i * 10L, i * 10L + 6L))
      .toDF("the id", "start.us", "end.us")
    assert(IntervalPlan.bucketWidthFor(iv, "start.us", "end.us") == 7L)
    assert(IntervalPlan.hotBucketProduct(iv, "start.us", "end.us",
      iv, "start.us", "end.us", 7L) > 0.0)
    IntervalPlan.requireFit(iv, "start.us", "end.us",
      iv, "start.us", "end.us", 7L)
  }
}
