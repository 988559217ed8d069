package graft.streaming

import graft.SparkTestBase
import graft.streaming.CdcStream.{Chg, KeyState}

class CdcStreamSpec extends SparkTestBase {

  test("fold: greatest (us, event_id) wins regardless of op or arrival order") {
    val batch = Seq(
      Chg(1, 300, 1, "U", 3.0),
      Chg(1, 100, 9, "I", 1.0), // out of order within the batch
      Chg(1, 300, 0, "D", 0.0)) // same us, lower event_id -> loses
    val st = CdcStream.fold(None, batch)
    assert(st == KeyState("U", 300, 1, 3.0))
    // carried state supersedes only on a strictly greater key
    assert(CdcStream.fold(Some(st), Seq(Chg(1, 200, 99, "D", 0.0))) == st)
    assert(CdcStream.fold(Some(st), Seq(Chg(1, 300, 2, "D", 0.0))) ==
      KeyState("D", 300, 2, 0.0))
  }

  test("replay: cross-batch state carry equals the batch LWW window") {
    val spark2 = spark
    import spark2.implicits._
    val changes = Seq(
      // key 1: I then U in a later batch, then a D that LOSES on ts
      Chg(1, 1000000L, 1, "I", 1.0),
      Chg(1, 5000000000L, 2, "U", 2.0),
      Chg(1, 3000000000L, 3, "D", 0.0),
      // key 2: tombstoned last -> leaves the table
      Chg(2, 1000000L, 4, "I", 4.0),
      Chg(2, 6000000000L, 5, "D", 0.0),
      // key 3: same-us tie broken by event_id
      Chg(3, 2000000000L, 6, "U", 6.0),
      Chg(3, 2000000000L, 7, "U", 7.0))
    val out = CdcStream.replay(spark, changes, batches = 3)
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._5))).toMap
    assert(out(1L) == (("U", 5000000000L, 2.0)))
    assert(out(2L) == (("D", 6000000000L, 0.0))) // tombstone surfaces...
    assert(out(3L) == (("U", 2000000000L, 7.0)))
    // ...and the table projection drops it
    val alive = CdcStream.replay(spark, changes, batches = 3)
      .filter(org.apache.spark.sql.functions.col("last_op") =!= "D")
      .select("user_id").as[Long].collect().toSet
    assert(alive == Set(1L, 3L))
  }
}
