package graft.operators

import graft.SparkTestBase

class SsspSpec extends SparkTestBase {
  import spark.implicits._

  /** Single-threaded bounded Bellman-Ford reference:
    * dist_h(v) = min cost over walks of <= maxHops edges. */
  private def reference(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
                        maxHops: Int): Map[Long, Long] = {
    var dist = sources.distinct.map(_ -> 0L).toMap
    for (_ <- 1 to maxHops) {
      val relaxed = edges.flatMap { case (s, d, w) =>
        dist.get(s).map(ds => d -> (ds + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    dist
  }

  private def run(es: Seq[(Long, Long, Long)], srcs: Seq[Long],
                  maxHops: Int): Map[Long, Long] =
    Sssp.bounded(es.toDF("src", "dst", "w"), srcs.toDF("node"), maxHops)
      .as[(Long, Long)].collect().toMap

  private val graph = Seq[(Long, Long, Long)](
    // two routes 0->3: direct heavy edge vs light 3-hop chain
    (0, 3, 10), (0, 1, 1), (1, 2, 1), (2, 3, 1),
    (3, 4, 2), (4, 0, 7), // cycle back
    (5, 6, 4))            // island pair

  test("bounded depth picks the cheaper path only once depth allows it") {
    // <=1 hop: only the direct edge; <=3 hops: the cheap chain wins
    assert(run(graph, Seq(0L), 1)(3L) == 10L)
    assert(run(graph, Seq(0L), 3)(3L) == 3L)
    for (cap <- Seq(0, 1, 2, 3, 5, 8))
      assert(run(graph, Seq(0L), cap) == reference(graph, Seq(0L), cap),
        s"cap=$cap")
  }

  test("multi-source takes the min over sources; unreached stay absent") {
    val got = run(graph, Seq(0L, 5L), 4)
    assert(got == reference(graph, Seq(0L, 5L), 4))
    assert(got(6L) == 4L)
    assert(!got.contains(7L))
  }

  test("matches the reference on random weighted graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val es = Seq.fill(60)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong,
        (rnd.nextInt(9) + 1).toLong))
      val srcs = Seq(rnd.nextInt(20).toLong)
      assert(run(es, srcs, 6) == reference(es, srcs, 6), s"trial=$trial")
    }
  }

  test("zero-weight edges are fine; a negative weight is rejected") {
    assert(run(Seq((0L, 1L, 0L), (1L, 2L, 0L)), Seq(0L), 2) ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
    val ex = intercept[IllegalArgumentException] {
      run(Seq((0L, 1L, -1L)), Seq(0L), 2)
    }
    assert(ex.getMessage.contains("non-negative"))
  }
}
