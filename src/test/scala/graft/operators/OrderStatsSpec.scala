package graft.operators

import graft.SparkTestBase

class OrderStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def reference(rows: Seq[(String, Double)],
                        fracs: Seq[(Long, Long)])
      : Set[(String, Long, Long, Double)] =
    rows.groupBy(_._1).flatMap { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      fracs.map { case (num, den) =>
        val k = (num * sorted.size + den - 1) / den
        (g, num, den, sorted(k.toInt - 1))
      }
    }.toSet

  private def run(rows: Seq[(String, Double)],
                  fracs: Seq[(Long, Long)], parts: Int = 0)
      : Set[(String, Long, Long, Double)] = {
    val df0 = rows.toDF("g", "v")
    val df = if (parts > 0) df0.repartition(parts) else df0
    OrderStats.discQuantiles(df, "g", "v", fracs)
      .as[(String, Long, Long, Double)].collect().toSet
  }

  private val fracs = Seq((1L, 20L), (1L, 2L), (19L, 20L), (1L, 1L))

  test("known small groups: k = ceil(num*n/den), 1-based, existing values") {
    val rows = Seq("a" -> 10.0, "a" -> 20.0, "a" -> 30.0, "b" -> 5.0)
    val got = run(rows, Seq((1L, 2L), (1L, 1L)))
    assert(got == Set(("a", 1L, 2L, 20.0), ("a", 1L, 1L, 30.0),
      ("b", 1L, 2L, 5.0), ("b", 1L, 1L, 5.0)))
  }

  test("integer rationals avoid the 0.05*20 float-ceil trap") {
    // n = 20: ceil(1*20/20) = 1 -> the MINIMUM, not the 2nd element
    val rows = (1 to 20).map(i => "g" -> i.toDouble)
    assert(run(rows, Seq((1L, 20L))) == Set(("g", 1L, 20L, 1.0)))
  }

  test("matches a per-group sort reference on skewed random data") {
    val rnd = new scala.util.Random(23)
    // one giant group + tiny groups: the shape the range partitioner
    // must balance (a per-group window could not)
    val rows = (0 until 5000).map(_ => "big" -> rnd.nextDouble() * 100) ++
      (0 until 7).map(i => "small" -> i.toDouble) ++
      Seq("one" -> 42.0)
    val want = reference(rows, fracs)
    for (parts <- Seq(1, 3, 16))
      assert(run(rows, fracs, parts) == want, s"input parts=$parts")
  }

  test("duplicates: the k-th multiset element, boundary splits included") {
    val rows = Seq.fill(10)("d" -> 1.0) ++ Seq.fill(10)("d" -> 2.0)
    assert(run(rows, Seq((1L, 2L), (11L, 20L))) ==
      Set(("d", 1L, 2L, 1.0), ("d", 11L, 20L, 2.0)))
  }

  test("a null value fails loudly, naming the operator and column") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("g", "v")
    val e = intercept[Exception] {
      OrderStats.discQuantiles(df, "g", "v", Seq((1L, 2L))).collect()
    }
    assert(e.getMessage.contains("OrderStats.discQuantiles") &&
      e.getMessage.contains("null in `v`"))
  }

  test("a non-castable string value fails loudly (ANSI cast), not silently") {
    // under ANSI mode the cast itself raises CAST_INVALID_INPUT before
    // the null guard can run — either way the failure is loud, which is
    // the contract; a null INPUT (previous test) reaches our guard
    val df = Seq(("a", "1.5"), ("a", "not-a-number")).toDF("g", "v")
    val e = intercept[Exception] {
      OrderStats.discQuantiles(df, "g", "v", Seq((1L, 1L))).collect()
    }
    assert(e.getMessage.contains("OrderStats.discQuantiles") ||
      e.getMessage.contains("CAST_INVALID_INPUT"))
  }

  test("high-cardinality groups trip the driver-frame bound loudly") {
    // one group per row: the per-user-quantile anti-shape — must fail
    // with the message naming the window alternative, BEFORE a
    // partitions x groups frame reaches the driver
    val df = (1 to 500).map(i => (s"user_$i", i.toDouble)).toDF("g", "v")
    val e = intercept[Exception] {
      OrderStats.discQuantiles(df, "g", "v", Seq((1L, 2L)),
        maxGroupsPerPartition = 100).collect()
    }
    assert(e.getMessage.contains("distinct") &&
      e.getMessage.contains("Window.partitionBy"))
    // and the same data passes when the bound is raised deliberately
    val ok = OrderStats.discQuantiles(df, "g", "v", Seq((1L, 1L)),
      maxGroupsPerPartition = 1000).count()
    assert(ok == 500L)
  }
}
