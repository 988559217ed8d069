package graft.streaming

import graft.SparkTestBase
import graft.streaming.SessionStream.{OpenSession, SessEvent, SessionOut}

class SessionStreamSpec extends SparkTestBase {

  private val MIN = 60000000L // one minute in micros
  private val gap = 30 * MIN

  test("advance: extends within gap, closes past it, counts events") {
    val evs = Seq(SessEvent(1, 0, 1), SessEvent(1, 10 * MIN, 2),
      SessEvent(1, 50 * MIN, 3))
    val (closed, open) = SessionStream.advance(None, evs, gap)
    assert(closed == Seq(SessionOut(1, 0, 10 * MIN, 2)))
    assert(open.contains(OpenSession(50 * MIN, 50 * MIN, 1)))
  }

  test("advance: resumes an open session from state across batches") {
    val open0 = Some(OpenSession(0, 5 * MIN, 3))
    val (closed, open) =
      SessionStream.advance(open0, Seq(SessEvent(1, 20 * MIN, 9)), gap)
    assert(closed.isEmpty)
    assert(open.contains(OpenSession(0, 20 * MIN, 4)))
  }

  /** Batch gaps-and-islands reference. */
  private def reference(evs: Seq[SessEvent]): Set[SessionOut] =
    evs.groupBy(_.user_id).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.us, e.event_id))
      val sessions = sorted.foldLeft(Vector.empty[Vector[Long]]) {
        (acc, e) =>
          if (acc.nonEmpty && e.us - acc.last.last <= gap)
            acc.init :+ (acc.last :+ e.us)
          else acc :+ Vector(e.us)
      }
      sessions.map(s => SessionOut(u, s.head, s.last, s.size))
    }.toSet

  test("replay equals batch sessionization, cross-midnight included") {
    val day = 86400000000L
    val b = day // base offset: epoch-0 rows would be "late" vs the
                // INITIAL watermark (0) and silently dropped
    val evs = Seq(
      // user 1: one same-day session, then a cross-midnight session
      SessEvent(1, b + 1000 * MIN, 1), SessEvent(1, b + 1010 * MIN, 2),
      SessEvent(1, b + day - 5 * MIN, 3), SessEvent(1, b + day + 5 * MIN, 4),
      // user 2: three single-event sessions on three days
      SessEvent(2, b, 5), SessEvent(2, b + day, 6),
      SessEvent(2, b + 2 * day, 7),
      // user 3: duplicate timestamps inside one session
      SessEvent(3, b + day + 100 * MIN, 8),
      SessEvent(3, b + day + 100 * MIN, 9))
    val got = SessionStream.replayWeekly(spark, evs, gap)
      .collect().map(r => SessionOut(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got == reference(evs))
    // the cross-midnight pair really is ONE session
    assert(got.contains(SessionOut(1, b + day - 5 * MIN, b + day + 5 * MIN, 2)))
  }

  test("replay handles within-batch disorder (handler sorts)") {
    val b = 86400000000L
    val evs = Seq(SessEvent(7, b + 20 * MIN, 2), SessEvent(7, b, 1),
      SessEvent(7, b + 90 * MIN, 3))
    val got = SessionStream.replayWeekly(spark, evs, gap)
      .collect().map(r => SessionOut(r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(SessionOut(7, b, b + 20 * MIN, 2),
      SessionOut(7, b + 90 * MIN, b + 90 * MIN, 1)))
  }
}
