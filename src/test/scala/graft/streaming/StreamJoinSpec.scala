package graft.streaming

import graft.SparkTestBase
import graft.streaming.StreamJoin.Ev

class StreamJoinSpec extends SparkTestBase {

  private val HOUR = 3600000000L
  private val DAY = 24 * HOUR
  private val W = 2 * HOUR

  private def reference(vs: Seq[Ev], ps: Seq[Ev])
      : Set[(Long, Long, Long)] =
    (for {
      v <- vs; p <- ps
      if v.user_id == p.user_id && p.us >= v.us && p.us <= v.us + W
    } yield (v.user_id, v.event_id, p.event_id)).toSet

  private def run(vs: Seq[Ev], ps: Seq[Ev]): Set[(Long, Long, Long)] =
    StreamJoin.replay(spark, vs, ps, W)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("matches inside the window, inclusive bounds, per user") {
    val b = DAY
    val vs = Seq(Ev(1, b, 10), Ev(1, b + 5 * HOUR, 11), Ev(2, b, 20))
    val ps = Seq(
      Ev(1, b, 100),           // equal ts: inclusive lower bound
      Ev(1, b + W, 101),       // exactly window end: inclusive
      Ev(1, b + W + 1, 102),   // one past: only matches view 11? no —
                               // outside both view windows
      Ev(2, b + HOUR, 200),    // other user
      Ev(3, b, 300))           // user with no views
    val got = run(vs, ps)
    assert(got == reference(vs, ps))
    assert(got == Set((1L, 10L, 100L), (1L, 10L, 101L),
      (2L, 20L, 200L)))
  }

  test("a match across micro-batch (week) boundaries still lands") {
    val weekEnd = 7 * DAY
    val vs = Seq(Ev(5, weekEnd - HOUR, 1))      // fed in week 0
    val ps = Seq(Ev(5, weekEnd + HOUR / 2, 2))  // fed in week 1
    assert(run(vs, ps) == Set((5L, 1L, 2L)))
  }

  test("purchases before any view never match (one-directional window)") {
    val b = DAY
    val vs = Seq(Ev(9, b + HOUR, 1))
    val ps = Seq(Ev(9, b, 2))
    assert(run(vs, ps) == reference(vs, ps))
    assert(run(vs, ps).isEmpty)
  }

  test("left outer: unmatched views emit once, null-padded, at horizon") {
    val b = DAY
    val vs = Seq(Ev(1, b, 10), Ev(1, b + 5 * HOUR, 11))
    val ps = Seq(Ev(1, b + HOUR, 100)) // matches view 10 only
    val got = StreamJoin.replay(spark, vs, ps, W, joinType = "left_outer")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set((1L, 10L, 100L), (1L, 11L, -1L)))
  }
}
