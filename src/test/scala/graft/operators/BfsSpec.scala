package graft.operators

import graft.SparkTestBase

class BfsSpec extends SparkTestBase {
  import spark.implicits._

  /** Single-threaded reference BFS. */
  private def reference(edges: Seq[(Long, Long)], sources: Seq[Long],
                        maxHops: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var dist = sources.distinct.map(_ -> 0L).toMap
    var frontier = sources.distinct
    var h = 1L
    while (h <= maxHops && frontier.nonEmpty) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .distinct.filterNot(dist.contains)
      dist = dist ++ next.map(_ -> h)
      frontier = next
      h += 1
    }
    dist
  }

  private val edges = Seq[(Long, Long)](
    (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 0), // 6-cycle
    (1, 9), (9, 9), (7, 8))                         // branch, self-loop, island

  private def run(es: Seq[(Long, Long)], srcs: Seq[Long], maxHops: Int,
                  interval: Int = 5): Map[Long, Long] =
    Bfs.hops(es.toDF("src", "dst"), srcs.toDF("node"), maxHops,
        checkpointInterval = interval)
      .as[(Long, Long)].collect().toMap

  test("matches the reference on the hand graph at every cap") {
    for (cap <- Seq(0, 1, 2, 3, 7))
      assert(run(edges, Seq(0L), cap) == reference(edges, Seq(0L), cap),
        s"cap=$cap")
  }

  test("multi-source takes the minimum wave; islands stay absent") {
    val got = run(edges, Seq(0L, 7L), 7)
    assert(got == reference(edges, Seq(0L, 7L), 7))
    assert(got(8L) == 1L)     // reached from the island source
    assert(!got.contains(6L)) // unreachable node id: absent, no sentinel
  }

  test("terminates before the cap when the frontier empties") {
    // chain of 3 nodes, cap 50: must not loop 50 rounds
    val got = run(Seq((1L, 2L), (2L, 3L)), Seq(1L), 50)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("checkpoint cadence is result-invariant and plan stays bounded") {
    val big = (0 until 400).map(i => (i.toLong, ((i * 7 + 3) % 400).toLong))
    val expected = reference(big, Seq(0L, 13L), 20)
    for (interval <- Seq(1, 3, 100)) {
      val df = Bfs.hops(big.toDF("src", "dst"), Seq(0L, 13L).toDF("node"),
        maxHops = 20, checkpointInterval = interval)
      assert(df.as[(Long, Long)].collect().toMap == expected,
        s"interval=$interval")
      val lines =
        df.queryExecution.optimizedPlan.treeString.linesIterator.size
      assert(lines < 10, s"interval=$interval plan depth $lines")
    }
  }

  test("sources not present in the graph still settle at dist 0") {
    val got = run(Seq((1L, 2L)), Seq(99L), 3)
    assert(got == Map(99L -> 0L))
  }
}
