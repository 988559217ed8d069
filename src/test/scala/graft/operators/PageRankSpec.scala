package graft.operators

import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  /** Single-threaded reference of the exact integer recurrence. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        scale: Long): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = nodes.map(_ -> scale).toMap
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / deg(s) }.sum
      }
      rank = nodes.map(n =>
        n -> (15L * scale / 100L + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  private val edges = Seq[(Long, Long)](
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 5)) // dangling-free + self-loop

  test("matches the integer recurrence on a hand graph") {
    for (iters <- Seq(0, 1, 3)) {
      val got = PageRank.run(edges.toDF("src", "dst"), iters)
        .as[(Long, Long)].collect().toMap
      assert(got == reference(edges, iters, 1000000000000L), s"iters=$iters")
    }
  }

  test("dangling node keeps base rank; its mass leaks") {
    val e = Seq[(Long, Long)]((1, 2)).toDF("src", "dst") // 2 is dangling
    val got = PageRank.run(e, 2).as[(Long, Long)].collect().toMap
    assert(got == reference(Seq((1L, 2L)), 2, 1000000000000L))
    // node 1 receives nothing after round 1: pure base
    assert(got(1L) == 150000000000L)
  }

  test("empty edge list yields an empty rank table") {
    assert(PageRank.run(
      Seq.empty[(Long, Long)].toDF("src", "dst"), 3).count() == 0)
  }

  test("checkpoint cadence is result-invariant (pure integer recurrence)") {
    val expected = reference(edges, 7, 1000000000000L)
    for (interval <- Seq(1, 2, 5, 100)) {
      val got = PageRank.run(edges.toDF("src", "dst"), 7,
          checkpointInterval = interval)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"interval=$interval")
    }
  }

  test("plan size stays bounded across 20 iterations (lineage truncated)") {
    val big = (1 to 200).map(i =>
      ((i % 23).toLong, ((i * 7) % 29).toLong)).distinct
    val df = PageRank.run(big.toDF("src", "dst"), 20)
    // the returned frame is an eager localCheckpoint: a scan of
    // materialized blocks, NOT a 20-deep join tree
    val lines = df.queryExecution.optimizedPlan.treeString.linesIterator.size
    assert(lines < 10, s"plan tree unexpectedly deep: $lines lines")
    assert(df.count() == big.flatMap(e => Seq(e._1, e._2)).distinct.size)
  }

  test("overflow headroom guard fails loudly instead of wrapping") {
    // 3 rank-scale sources feed node 4 with out_deg 1 each: the summed
    // contribution is 3*scale = 1.5e17 > Long.Max/85 — the 85x multiply
    // would wrap silently; the inline assert must fire instead
    val hot = Seq[(Long, Long)]((1, 4), (2, 4), (3, 4))
    val ex = intercept[Exception] {
      PageRank.run(hot.toDF("src", "dst"), 1, scale = 50000000000000000L)
        .collect()
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(ex).contains("overflow headroom"))
  }

  test("result is partition-count invariant (integer sums commute)") {
    val big = (1 to 400).map(i =>
      ((i % 37).toLong, ((i * 13) % 41).toLong)).distinct
    val expected = reference(big, 3, 1000000000000L)
    for (parts <- Seq(1, 7)) {
      val got = PageRank.run(big.toDF("src", "dst").repartition(parts), 3)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("personalized: all-node seeds equal uniform; off-seed mass propagates") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1), (4, 5))
    val df = edges.toDF("src", "dst")
    val allNodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    val uniform = PageRank.run(df, 3).as[(Long, Long)].collect().toMap
    val allSeeded = PageRank.runPersonalized(df, allNodes, 3)
      .as[(Long, Long)].collect().toMap
    assert(allSeeded == uniform)
    // seed {1}: the 4->5 component gets no teleport and no path from
    // the seed — both its ranks collapse to zero propagated mass
    val seeded = PageRank.runPersonalized(df, Seq(1L).toDF("node"), 3)
      .as[(Long, Long)].collect().toMap
    assert(seeded(4L) == 0L && seeded(5L) == 0L)
    // the seed's cycle keeps positive rank, seed highest
    assert(seeded(1L) > 0L && seeded(2L) > 0L &&
      seeded(1L) >= seeded(2L))
    // a source absent from the graph is ignored
    val ghost = PageRank.runPersonalized(df,
      Seq(1L, 99L).toDF("node"), 3).as[(Long, Long)].collect().toMap
    assert(ghost == seeded)
  }
}
