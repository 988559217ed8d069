package graft.streaming

import graft.SparkTestBase
import graft.streaming.EnrichStream.Ev

class EnrichStreamSpec extends SparkTestBase {

  test("stream-static enrichment equals the batch join for any batching") {
    val spark2 = spark
    import spark2.implicits._
    val dim = Seq((1L, "A"), (2L, "B"), (4L, "D"))
      .toDF("k", "seg")
    val events = Seq(
      Ev(10L, 1L, 1000000L, 1.0),
      Ev(11L, 2L, 2000000L, 2.0),
      Ev(12L, 3L, 5000000000L, 3.0), // no dim row -> null segment
      Ev(13L, 1L, 9000000000L, 4.0),
      Ev(14L, 4L, 9500000000L, 5.0))
    val expected = Map(
      10L -> Some("A"), 11L -> Some("B"), 12L -> None,
      13L -> Some("A"), 14L -> Some("D"))
    // two different batchings must produce the identical appended table
    // (stateless join => batching-invariant)
    for (batches <- Seq(3, 5)) {
      val got = EnrichStream.replay(spark, events, dim, "k", Seq("seg"),
          batches = batches)
        .collect()
        .map(r => r.getLong(1) -> Option(r.getAs[String]("seg"))).toMap
      assert(got == expected, s"batches=$batches")
    }
  }
}
