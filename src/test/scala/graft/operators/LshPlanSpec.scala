package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pure math — no Spark session needed. Pins the planner to the two
  * configurations the engine already certifies (the q_dbscan gate's
  * recall-certain geometry and Scale100's production log2(n) legs) and
  * generalizes the gate's 0.749^48 ≈ 1e-6 recall argument. */
class LshPlanSpec extends AnyFunSuite {

  test("planner reproduces the q_dbscan gate geometry (3 planes, " +
      "48 tables) and its recall bound") {
    assert(LshPlan.planesFor(500, 64) == 3)
    assert(LshPlan.tablesFor(0.40, 3, 1e-6) == 48)
    assert(LshPlan.missProb(0.40, 3, 48) <= 1e-6)
    // the documented closed form: per-table miss ≈ 0.749 at the
    // threshold angle (VectorQueries' 0.749^48 argument)
    val perTableMiss = 1.0 - math.pow(LshPlan.collideProb(0.40), 3)
    assert(math.abs(perTableMiss - 0.749) < 0.001)
  }

  test("planes track log2(n): Scale100's production-regime values") {
    assert(LshPlan.planesFor(5000, 1) == 12)
    assert(LshPlan.planesFor(500000, 1) == 19)
    val ps = Seq(1000L, 10000L, 100000L, 1000000L)
      .map(LshPlan.planesFor(_, 64))
    assert(ps == ps.sorted && ps.distinct == ps, "strictly monotone in n")
  }

  test("requireFit rejects the measured spill-exhaustion configuration " +
      "and passes the planner-sized ones") {
    // the r10 100x leg: 12 planes held fixed while the corpus grew to
    // 500k rows — expected occupancy 122/bucket, candidates ~100x linear
    val ex = intercept[IllegalArgumentException] {
      LshPlan.requireFit(12, 500000L, maxExpectedBucket = 64)
    }
    assert(ex.getMessage.contains("under-planed"))
    assert(ex.getMessage.contains("planesFor"))
    LshPlan.requireFit(19, 500000L, maxExpectedBucket = 64)
    LshPlan.requireFit(3, 500L, maxExpectedBucket = 256)
  }

  test("unattainable table budgets fail LOUDLY, never return 1 table " +
      "(the log1p saturation fix, ADVICE r11/verdict r12)") {
    // deep planes at a moderate threshold: per-table miss is
    // representably < 1 (log1p keeps it finite) but the required table
    // count overflows Int — the second require fires
    val exCount = intercept[IllegalArgumentException] {
      LshPlan.tablesFor(0.0, 62, 1e-6)
    }
    assert(exCount.getMessage.contains("unattainable"), exCount.getMessage)
    // near-orthogonal threshold: collideProb^62 underflows double to
    // exactly 0, per-table miss rounds to 1.0 — the log1p-domain
    // require fires instead of dividing to 0 tables
    val exUnderflow = intercept[IllegalArgumentException] {
      LshPlan.tablesFor(-0.999999999999, 62, 1e-6)
    }
    assert(exUnderflow.getMessage.contains("unattainable"),
      exUnderflow.getMessage)
    assert(exUnderflow.getMessage.contains("multiprobe"))
    // deep planes at high threshold stay REPRESENTABLE and attainable:
    // a finite, large, correct count (~23k = ln(1e-2)/ln1p(-0.856^55))
    // rather than a loud failure — pin the magnitude, not the ulp
    val t55 = LshPlan.tablesFor(0.9, 55, 1e-2)
    assert(LshPlan.missProb(0.9, 55, t55) <= 1e-2)
    assert(t55 > 10000 && t55 < 50000, s"t55=$t55")
  }

  test("recall bound holds at computed planes across thresholds and " +
      "corpus sizes") {
    for (th <- Seq(0.3, 0.5, 0.7, 0.9); n <- Seq(500L, 50000L, 5000000L)) {
      val planes = LshPlan.planesFor(n, 64)
      val tables = LshPlan.tablesFor(th, planes, 1e-6)
      assert(LshPlan.missProb(th, planes, tables) <= 1e-6,
        s"threshold=$th n=$n planes=$planes tables=$tables")
    }
  }
}
