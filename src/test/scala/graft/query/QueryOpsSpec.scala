package graft.query

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QueryOpsSpec extends SparkTestBase {

  import spark.implicits._

  lazy val df = Seq(
    ("pk1", 3, "c"), ("pk1", 1, "a"), ("pk1", 2, "b"),
    ("pk2", 1, "x"), ("pk2", 2, "y")).toDF("pk", "ck", "v")

  test("W1: per-partition limit keeps first n by clustering order") {
    val got = QueryOps.perPartitionLimit(df, 2, Seq("pk"), Seq(col("ck")))
      .orderBy("pk", "ck").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(got.toSeq == Seq(("pk1", 1), ("pk1", 2), ("pk2", 1), ("pk2", 2)))
  }

  test("W2: keyset pagination pages forward without overlap") {
    val keys = (1 to 25).map(i => (i.toLong, s"row$i")).toDF("k", "v")
    val page1 = QueryOps.keysetPage(keys, "k", None, 10)
      .collect().map(_.getLong(0))
    val page2 = QueryOps.keysetPage(keys, "k", Some(page1.last), 10)
      .collect().map(_.getLong(0))
    val page3 = QueryOps.keysetPage(keys, "k", Some(page2.last), 10)
      .collect().map(_.getLong(0))
    assert(page1.toSeq == (1L to 10L))
    assert(page2.toSeq == (11L to 20L))
    assert(page3.toSeq == (21L to 25L))
  }

  test("top-k breaks count ties deterministically") {
    val got = QueryOps.topK(
        Seq("b", "b", "a", "a", "c").toDF("g"), Seq("g"), 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a", 2L), ("b", 2L)))
  }

  test("as-of join picks latest right row at-or-before, per key") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, "k1", ts("2024-06-05 00:00:00")),
      (2L, "k1", ts("2024-06-01 00:00:00")),  // equal ts -> inclusive
      (3L, "k1", ts("2023-01-01 00:00:00")),  // before all -> null
      (4L, "k2", ts("2024-06-05 00:00:00")),
      (5L, "k3", ts("2024-06-05 00:00:00"))   // key with no right rows
    ).toDF("id", "k", "t")
    val right = Seq(
      ("k1", ts("2024-06-01 00:00:00"), 10.0),
      ("k1", ts("2024-06-03 00:00:00"), 30.0),
      ("k2", ts("2024-06-04 00:00:00"), 40.0)
    ).toDF("k", "rt", "v")
    val got = QueryOps.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(
      1L -> Some(30.0), 2L -> Some(10.0), 3L -> None,
      4L -> Some(40.0), 5L -> None))
  }

  test("as-of join preserves NULLs inside the matched right row") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq((1L, "k1", ts("2024-06-05 00:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      ("k1", ts("2024-06-01 00:00:00"), Option(10.0), Option("old")),
      // the MATCHED row: v is legitimately NULL, w present — output must
      // carry (NULL, "new"), not resurrect 10.0 from the older row
      ("k1", ts("2024-06-03 00:00:00"), None: Option[Double], Option("new"))
    ).toDF("k", "rt", "v", "w")
    val got = QueryOps.asofJoin(left, right, Seq("k"), "t", "rt",
        Seq("v", "w")).select("id", "v", "w").collect()
    assert(got.length == 1)
    assert(got(0).isNullAt(1), "matched row's NULL must survive")
    assert(got(0).getString(2) == "new")
  }

  test("A4: observed metrics report processed and enriched counts") {
    import scala.collection.mutable
    val seen = mutable.Map.empty[String, (Long, Long)]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = {
        qe.observedMetrics.get("graft_metrics").foreach { row =>
          seen("m") = (row.getLong(0), row.getLong(1))
        }
      }
      override def onFailure(fn: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      QueryOps.withIngestMetrics(df, enriched = col("ck") > 1).collect()
      var waited = 0
      while (!seen.contains("m") && waited < 50) {
        Thread.sleep(100); waited += 1
      }
      assert(seen.get("m").contains((5L, 3L)))
    } finally spark.listenerManager.unregister(listener)
  }

  test("sessionize numbers gap-separated bursts per key") {
    import spark.implicits._
    val events = Seq(
      // user 1: burst(0,10,20), gap, burst(100), gap, burst(200,205)
      (1L, 0L), (1L, 10L), (1L, 20L), (1L, 100L), (1L, 200L), (1L, 205L),
      // user 2: single session incl. a tie at t=10
      (2L, 10L), (2L, 10L), (2L, 40L)).toDF("u", "t")
    val out = QueryOps.sessionize(events, col("u"), col("t"), gap = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(out == Seq(
      (1L, 0L, 1L), (1L, 10L, 1L), (1L, 20L, 1L),
      (1L, 100L, 2L), (1L, 200L, 3L), (1L, 205L, 3L),
      (2L, 10L, 1L), (2L, 10L, 1L), (2L, 40L, 1L)))
  }

  test("sessionize: a gap exactly equal to the threshold does NOT break") {
    import spark.implicits._
    val out = QueryOps.sessionize(
        Seq((1L, 0L), (1L, 50L), (1L, 101L)).toDF("u", "t"),
        col("u"), col("t"), gap = 50L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(out == Seq((0L, 1L), (50L, 1L), (101L, 2L)))
  }

  test("funnel chains first-touch steps strictly in order") {
    import spark.implicits._
    val events = Seq(
      // user 1 completes A->B->C in order
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "C"),
      // user 2: B before A — the early B must NOT count; no C
      (2L, 5L, "B"), (2L, 10L, "A"), (2L, 40L, "B"),
      // user 3: A only; later same-ts B is NOT strictly after... at
      // equal timestamps the step does not advance
      (3L, 10L, "A"), (3L, 10L, "B"),
      // user 4 never does A -> absent from the funnel
      (4L, 10L, "B"), (4L, 20L, "C"),
      // user 5: two A's — first-touch wins, then B between them counts
      (5L, 10L, "A"), (5L, 15L, "B"), (5L, 20L, "A")
    ).toDF("u", "t", "e")
    val out = QueryOps.funnel(events, col("u"), col("t"), col("e"),
        Seq("A", "B", "C"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getAs[Long]("depth")))).toMap
    assert(out(1L) == ((Some(10L), Some(20L), Some(30L), 3L)))
    assert(out(2L) == ((Some(10L), Some(40L), None, 2L)))
    assert(out(3L) == ((Some(10L), None, None, 1L)))
    assert(!out.contains(4L))
    assert(out(5L) == ((Some(10L), Some(15L), None, 2L)))
  }

  test("windowed funnel: a step beyond maxGap does not convert, and " +
      "the summary reports non-increasing prefix counts") {
    import spark.implicits._
    val events = Seq(
      // user 1 converts fully within the window
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "C"),
      // user 2: B arrives 100 after A — beyond gap 50, stalls at A;
      // the later in-window C must NOT count without a reached B
      (2L, 10L, "A"), (2L, 110L, "B"), (2L, 120L, "C"),
      // user 3: B in window, C exactly at the boundary (inclusive)
      (3L, 10L, "A"), (3L, 60L, "B"), (3L, 110L, "C"),
      // user 4: first A's window misses B, but a second A does not
      // re-anchor (first-touch): stalls at A
      (4L, 10L, "A"), (4L, 200L, "A"), (4L, 210L, "B")
    ).toDF("u", "t", "e")
    val rt = QueryOps.funnel(events, col("u"), col("t"), col("e"),
        Seq("A", "B", "C"), maxGap = Some(50L))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("depth")).toMap
    assert(rt == Map(1L -> 3L, 2L -> 1L, 3L -> 3L, 4L -> 1L))
    val sm = QueryOps.funnelSummary(events, col("u"), col("t"), col("e"),
        Seq("A", "B", "C"), maxGap = Some(50L))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(sm.toSeq == Seq((1, "A", 4L), (2, "B", 2L), (3, "C", 2L)))
    // without the window the same events convert users 2 and 4 deeper
    val un = QueryOps.funnelSummary(events, col("u"), col("t"), col("e"),
        Seq("A", "B", "C")).collect().map(r => r.getLong(2))
    assert(un.toSeq == Seq(4L, 4L, 3L))
  }

  test("sequenceMatch counts non-overlapping regex matches over the " +
      "time-ordered per-entity event string") {
    import spark.implicits._
    val events = Seq(
      // user 1: v c p  → one clean view→purchase ('v[^ep]*p')
      (1L, 10L, 1L, "v"), (1L, 20L, 2L, "c"), (1L, 30L, 3L, "p"),
      // user 2: v e p  → error between: no match
      (2L, 10L, 4L, "v"), (2L, 20L, 5L, "e"), (2L, 30L, 6L, "p"),
      // user 3: v p v p → two non-overlapping matches
      (3L, 10L, 7L, "v"), (3L, 20L, 8L, "p"),
      (3L, 30L, 9L, "v"), (3L, 40L, 10L, "p"),
      // user 4: ties on t break by the unique id: p before v → no match
      (4L, 10L, 12L, "v"), (4L, 10L, 11L, "p")
    ).toDF("u", "t", "id", "c")
    val out = QueryOps.sequenceMatch(events, col("u"),
        Seq(col("t"), col("id")), col("c"), "v[^ep]*p")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((3L, 1L)))
    assert(out(2L) == ((3L, 0L)))
    assert(out(3L) == ((4L, 2L)))
    assert(out(4L) == ((2L, 0L)))
    // schema stability (ADVICE r14): the guard-riding projection must
    // not flip entity to nullable when the input key is non-nullable
    val schema = QueryOps.sequenceMatch(events, col("u"),
      Seq(col("t"), col("id")), col("c"), "v[^ep]*p").schema
    assert(!schema("entity").nullable,
      "entity must keep the input's non-nullability through the guard")
  }

  test("sequenceMatch bounded-group contract fires loudly above " +
      "maxSeqLen — even when the caller prunes to (entity, n_matches)") {
    import spark.implicits._
    val events = (1L to 5L).map(i => (7L, i * 10L, i, "v"))
      .toDF("u", "t", "id", "c")
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    // full projection
    val exFull = intercept[Exception] {
      QueryOps.sequenceMatch(events, col("u"), Seq(col("t"), col("id")),
        col("c"), "v", maxSeqLen = 3L).collect()
    }
    assert(messages(exFull).exists(m =>
      m.contains("pre-split") && m.contains("entity 7")), messages(exFull))
    // the ADVICE r12 hole: a projection reading ONLY n_matches let
    // Catalyst prune the seq_len-riding guard away — it must fire here
    val exPruned = intercept[Exception] {
      QueryOps.sequenceMatch(events, col("u"), Seq(col("t"), col("id")),
          col("c"), "v", maxSeqLen = 3L)
        .select("entity", "n_matches").collect()
    }
    assert(messages(exPruned).exists(_.contains("pre-split")),
      messages(exPruned))
    // at the limit it passes, and the guard adds nothing to the values
    val ok = QueryOps.sequenceMatch(events, col("u"),
        Seq(col("t"), col("id")), col("c"), "v", maxSeqLen = 5L)
      .collect()
    assert(ok.length == 1 && ok(0).getLong(1) == 5L &&
      ok(0).getLong(2) == 5L)
    // ADVICE r13: entity did not carry the guard, so an ENTITY-ONLY
    // projection pruned it — the when-passthrough must fire here too
    val exEntity = intercept[Exception] {
      QueryOps.sequenceMatch(events, col("u"), Seq(col("t"), col("id")),
          col("c"), "v", maxSeqLen = 3L)
        .select("entity").collect()
    }
    assert(messages(exEntity).exists(_.contains("pre-split")),
      messages(exEntity))
    // and the passthrough is values-neutral for a passing entity
    val okEntity = QueryOps.sequenceMatch(events, col("u"),
        Seq(col("t"), col("id")), col("c"), "v", maxSeqLen = 5L)
      .select("entity").collect()
    assert(okEntity.map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("funnel scan modes (local-checkpoint / disk-persist / rescan) " +
      "agree on results — the ADVICE r13 fault-tolerance knob never " +
      "changes the answer") {
    import spark.implicits._
    import QueryOps.FunnelScan
    val events = Seq(
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "C"),
      (2L, 10L, "A"), (2L, 110L, "B"), (2L, 120L, "C"),
      (3L, 10L, "A"), (3L, 60L, "B"), (3L, 110L, "C"),
      (4L, 10L, "A"), (4L, 200L, "A"), (4L, 210L, "B")
    ).toDF("u", "t", "e")
    def run(m: QueryOps.FunnelScan) =
      QueryOps.funnel(events, col("u"), col("t"), col("e"),
          Seq("A", "B", "C"), maxGap = Some(50L), scan = m)
        .collect()
        .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
          Option(r.get(3)), r.getAs[Long]("depth")))
        .sortBy(_._1).toSeq
    val base = run(FunnelScan.LocalCheckpoint)
    assert(run(FunnelScan.DiskPersist) == base)
    assert(run(FunnelScan.Rescan) == base)
    assert(base.map(t => t._1 -> t._5).toMap ==
      Map(1L -> 3L, 2L -> 1L, 3L -> 3L, 4L -> 1L))
  }

  test("column profile: rows, nulls, exact distincts, native-order " +
      "min/max as strings") {
    import spark.implicits._
    val df = Seq(
      (Some(9L), Some("b")), (Some(10L), None),
      (Some(9L), Some("a")), (None, Some("a"))
    ).toDF("num", "s")
    val out = graft.operators.Profile.columns(df, Seq("num", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
          r.getString(5)))).toMap
    // min/max computed on the NATIVE type then cast: 9 < 10 numerically
    // (a lexicographic profile would report max "9")
    assert(out("num") == ((4L, 1L, 2L, "9", "10")))
    assert(out("s") == ((4L, 1L, 2L, "a", "b")))
  }

  test("resampleFfill fills gaps with cnt=0 and carries the last value") {
    import spark.implicits._
    // key "a": events in buckets 0 and 30 (step 10) -> gaps at 10, 20;
    // bucket 0 has two events, the later one (ts 7) is the representative.
    // key "b": single event -> single-bucket grid, no gaps.
    val ev = Seq(
      ("a", 3L, 1L, 1.5), ("a", 7L, 2L, 2.5), ("a", 33L, 3L, 9.0),
      ("b", 105L, 4L, 4.0)
    ).toDF("k", "us", "id", "v")
    val out = QueryOps.resampleFfill(ev, col("k"), col("us"), col("id"),
        col("v"), stepUs = 10L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3)))))
      .toMap
    assert(out.size == 5)
    assert(out(("a", 0L)) == ((2L, Some(2.5)))) // later event wins in-bucket
    assert(out(("a", 10L)) == ((0L, Some(2.5)))) // gap: cnt 0, value carried
    assert(out(("a", 20L)) == ((0L, Some(2.5))))
    assert(out(("a", 30L)) == ((1L, Some(9.0))))
    assert(out(("b", 100L)) == ((1L, Some(4.0))))
  }

  test("resampleInterp lerps gap buckets in exact scaled integers") {
    import spark.implicits._
    // key "a": observed buckets 0 (v=10) and 30 (v=4), step 10.
    // Gaps at 10, 20 interpolate DOWN a 6-unit drop over 3 steps:
    //   b=10: 10e6 - (6e6*1) div 3 = 8e6;  b=20: 10e6 - (6e6*2) div 3 = 6e6
    // Truncation case, key "b": 0 (v=0) to 30 (v=10): 10e6*1 div 3 =
    // 3333333 (exact integer division, not a float rounding).
    val ev = Seq(
      ("a", 3L, 1L, 10L), ("a", 33L, 2L, 4L),
      ("b", 5L, 3L, 0L), ("b", 35L, 4L, 10L)
    ).toDF("k", "us", "id", "v")
    val out = QueryOps.resampleInterp(ev, col("k"), col("us"), col("id"),
        col("v"), stepUs = 10L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out.size == 8)
    assert(out(("a", 0L)) == ((1L, 10000000L)))
    assert(out(("a", 10L)) == ((0L, 8000000L)))
    assert(out(("a", 20L)) == ((0L, 6000000L)))
    assert(out(("a", 30L)) == ((1L, 4000000L)))
    assert(out(("b", 10L)) == ((0L, 3333333L)))
    assert(out(("b", 20L)) == ((0L, 6666666L)))
  }

  test("resampleInterp: observed buckets use their own value; in-bucket " +
      "representative is the latest (us, tie) event") {
    import spark.implicits._
    val ev = Seq(
      // same bucket 0: (us=7, id=2) wins -> v=9
      ("k", 3L, 1L, 1L), ("k", 7L, 2L, 9L),
      ("k", 25L, 3L, 9L) // flat segment: gap must interpolate to 9 exactly
    ).toDF("k", "us", "id", "v")
    val out = QueryOps.resampleInterp(ev, col("k"), col("us"), col("id"),
        col("v"), stepUs = 10L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(out == Map(0L -> 9000000L, 10L -> 9000000L, 20L -> 9000000L))
  }

  test("resampleFfill: ties on time break by the tie column; leading " +
      "buckets before any value stay null") {
    import spark.implicits._
    val ev = Seq(
      // same us=5: id 9 wins -> representative value 9.0
      ("k", 5L, 1L, Some(1.0)), ("k", 5L, 9L, Some(9.0)),
      // null value in bucket 2 does not erase the carried 9.0
      ("k", 25L, 3L, None: Option[Double])
    ).toDF("k", "us", "id", "v")
    val out = QueryOps.resampleFfill(ev, col("k"), col("us"), col("id"),
        col("v"), stepUs = 10L)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), Option(r.get(3))))).toMap
    assert(out(0L) == ((2L, Some(9.0))))
    assert(out(10L) == ((0L, Some(9.0))))
    // bucket 20 holds only a null-valued event: counted, but a null
    // representative cannot overwrite the carried 9.0 (ignoreNulls)
    assert(out(20L) == ((1L, Some(9.0))))
  }

  test("Graft.init wires views, UDFs and native expressions for SQL") {
    graft.Graft.init(spark, "/root/testdata/sf0.001")
    val r = spark.sql(
      """SELECT count(*) AS c,
        |  apex_domain('a.b.example.co.uk') AS apex,
        |  is_valid_domain_native('ok.com') AS v,
        |  long_to_ip(ip_block(ip_to_long('1.2.3.4'), 24)) AS blk
        |FROM lineitem""".stripMargin).collect()(0)
    assert(r.getLong(0) > 0)
    assert(r.getString(1) == "example.co.uk")
    assert(r.getBoolean(2))
    assert(r.getString(3) == "1.2.3.0")
  }
}
