package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.{GenForAll, SparkTestBase}

class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference O(n²) skyline: p survives iff no q dominates it. */
  private def brute(pts: Seq[(Long, Double, Double)])
      : Set[(Long, Double, Double)] =
    pts.filter { p =>
      !pts.exists(q => q._2 >= p._2 && q._3 >= p._3 &&
        (q._2 > p._2 || q._3 > p._3))
    }.toSet

  private def run(pts: Seq[(Long, Double, Double)], parts: Int)
      : Set[(Long, Double, Double)] =
    Skyline.skylineMax(
        pts.toDF("id", "x", "y").repartition(parts), "x", "y")
      .as[(Long, Double, Double)].collect().toSet

  test("random point sets match the NOT EXISTS definition") {
    // small coordinate domain forces heavy x/y ties and exact
    // duplicates — the cases where sweep bookkeeping goes wrong
    val gen = for {
      n <- Gen.choose(0, 40)
      pts <- Gen.listOfN(n, for {
        x <- Gen.choose(0, 6)
        y <- Gen.choose(0, 6)
      } yield (x.toDouble, y.toDouble))
    } yield pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    GenForAll.forAll(gen, n = 120) { pts =>
      if (pts.nonEmpty)
        assert(run(pts, 3) == brute(pts), s"points: $pts")
    }
  }

  test("result is partition-count invariant") {
    val pts = (1 to 500).map { i =>
      (i.toLong, (i * 37 % 101).toDouble, (i * 61 % 97).toDouble)
    }
    val expected = brute(pts)
    for (parts <- Seq(1, 4, 32))
      assert(run(pts, parts) == expected, s"parts=$parts")
  }

  test("duplicate frontier points all survive") {
    val pts = Seq((1L, 5.0, 5.0), (2L, 5.0, 5.0), (3L, 1.0, 9.0),
      (4L, 4.0, 4.0))
    assert(run(pts, 2) ==
      Set((1L, 5.0, 5.0), (2L, 5.0, 5.0), (3L, 1.0, 9.0)))
  }

  test("3-D BNL skyline matches the NOT EXISTS definition") {
    def brute3(pts: Seq[(Long, Double, Double, Double)]) =
      pts.filter { p =>
        !pts.exists(q =>
          q._2 >= p._2 && q._3 >= p._3 && q._4 >= p._4 &&
            (q._2 > p._2 || q._3 > p._3 || q._4 > p._4))
      }.toSet
    val gen = for {
      n <- Gen.choose(0, 30)
      pts <- Gen.listOfN(n, for {
        x <- Gen.choose(0, 4); y <- Gen.choose(0, 4); z <- Gen.choose(0, 4)
      } yield (x.toDouble, y.toDouble, z.toDouble))
    } yield pts.zipWithIndex.map { case ((x, y, z), i) =>
      (i.toLong, x, y, z)
    }
    GenForAll.forAll(gen, n = 80) { pts =>
      if (pts.nonEmpty) {
        val got = Skyline.skylineMaxN(
            pts.toDF("id", "x", "y", "z").repartition(3),
            Seq("x", "y", "z"))
          .as[(Long, Double, Double, Double)].collect().toSet
        assert(got == brute3(pts), s"points: $pts")
      }
    }
  }

  test("n-dim agrees with the 2-D sweep on shared inputs") {
    val pts = (1 to 300).map { i =>
      (i.toLong, (i * 37 % 101).toDouble, (i * 61 % 97).toDouble)
    }
    val sweep = run(pts, 4)
    val bnl = Skyline.skylineMaxN(pts.toDF("id", "x", "y").repartition(4),
        Seq("x", "y"))
      .as[(Long, Double, Double)].collect().toSet
    assert(bnl == sweep)
  }

  test("empty input yields an empty frontier, no error") {
    assert(run(Seq.empty, 4).isEmpty)
  }

  test("anti-correlated frontier engages the distributed range merge") {
    // x = -y: EVERY point is on the frontier (no point beats another
    // in both dims), so the local phase prunes nothing and a
    // single-task merge would concentrate all n rows. With
    // mergeMaxRows below n the range-merge path must engage, stay
    // multi-partition, and still return every row exactly once —
    // including duplicated boundary-candidate points.
    val n = 5000
    val pts = (1 to n).map(i => (i.toLong, i.toDouble, (n - i).toDouble)) ++
      Seq((9001L, 2500.0, 2500.0), (9002L, 2500.0, 2500.0)) // dup tie pair
    val df = pts.toDF("id", "x", "y").repartition(8)
    val res = Skyline.skylineMax(df, "x", "y", mergeMaxRows = 100)
    assert(res.rdd.getNumPartitions > 1,
      "distributed merge should keep multiple partitions")
    val got = res.as[(Long, Double, Double)].collect().toSet
    assert(got == brute(pts), "range-merge result differs from NOT EXISTS")
  }

  test("distributed merge equals single-task merge on random ties") {
    val gen = for {
      n <- Gen.choose(1, 60)
      pts <- Gen.listOfN(n, for {
        x <- Gen.choose(0, 6); y <- Gen.choose(0, 6)
      } yield (x.toDouble, y.toDouble))
    } yield pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    GenForAll.forAll(gen, n = 60) { pts =>
      val df = pts.toDF("id", "x", "y").repartition(3)
      val dist = Skyline.skylineMax(df, "x", "y", mergeMaxRows = 0)
        .as[(Long, Double, Double)].collect().toSet
      assert(dist == brute(pts), s"points: $pts")
    }
  }

  test("long dimensions beyond 2^53 compare exactly") {
    // adjacent longs above the double mantissa: doubleValue() would
    // collapse them to the same double and corrupt dominance
    val base = (1L << 53) + 2L
    val pts = Seq((1L, base, 10L), (2L, base + 1L, 10L), (3L, base, 11L))
    // (base+1,10) dominates (base,10); (base,11) survives (y beats)
    val got = Skyline.skylineMax(pts.toDF("id", "x", "y"), "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
    val gotN = Skyline.skylineMaxN(pts.toDF("id", "x", "y"), Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    assert(gotN == Set(2L, 3L))
  }

  test("null dimension throws naming the column") {
    val df = Seq((1L, Some(1.0), 2.0), (2L, None, 3.0))
      .toDF("id", "x", "y")
    val ex = intercept[Exception] {
      Skyline.skylineMax(df, "x", "y").collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse(""))).mkString(" | ")
    assert(rootMsg(ex).contains("skyline dimension 'x' is NULL"))
  }

  test("direction flags minimize via negation") {
    val df = Seq((1L, 2.0, 10.0), (2L, 3.0, 1.0), (3L, 1.0, 20.0))
      .toDF("id", "cost", "gain")
    // minimize cost, maximize gain: (2,3,1) dominated by nothing?
    // (1.0,20.0) dominates nothing else; (2.0,10.0) vs (1.0,20.0):
    // higher cost and lower gain → dominated. (3.0,1.0) likewise? no:
    // nothing has lower-or-equal cost AND higher-or-equal gain except
    // id=3/1 which have lower cost and higher gain → dominated.
    val got = Skyline.skyline(df, ("cost", false), ("gain", true))
      .select("id").as[Long].collect().toSet
    assert(got == Set(3L))
  }
}
