package graft.streaming

import graft.SparkTestBase
import graft.streaming.WindowedStream.Ev

class WindowedStreamSpec extends SparkTestBase {

  private val HOUR = 3600000000L
  private val DAY = 24 * HOUR

  private def reference(evs: Seq[Ev]): Map[Long, Long] =
    evs.groupBy(e => e.us / HOUR * HOUR).view.mapValues(_.size.toLong)
      .toMap

  private def run(evs: Seq[Ev]): Map[Long, Long] =
    WindowedStream.replayHourly(spark, evs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("append emissions equal the batch hourly counts") {
    val b = DAY
    val evs = Seq(
      Ev(b, 1), Ev(b + 1, 2), Ev(b + HOUR - 1, 3), // hour 0 of day 1
      Ev(b + HOUR, 4),                             // hour 1
      Ev(b + DAY + 5 * HOUR, 5),                   // next day
      Ev(b + 8 * DAY, 6))                          // next week's batch
    assert(run(evs) == reference(evs))
  }

  test("the sentinel flush emits the final open window, not itself") {
    val b = DAY
    val evs = Seq(Ev(b + 30 * 60 * 1000000L, 1))
    val got = run(evs)
    assert(got == Map(b -> 1L), "exactly the one real window")
  }

  test("hour boundaries split exactly (window start inclusive)") {
    val b = DAY
    val evs = Seq(Ev(b + HOUR - 1, 1), Ev(b + HOUR, 2))
    assert(run(evs) == Map(b -> 1L, (b + HOUR) -> 1L))
  }
}
