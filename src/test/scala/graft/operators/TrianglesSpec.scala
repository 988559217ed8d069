package graft.operators

import org.scalacheck.Gen

import graft.{GenForAll, SparkTestBase}

class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force per-node triangle counts over canonical edges. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val ce = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct.toSet
    val nodes = ce.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val tris = for {
      i <- nodes; j <- nodes if j > i; k <- nodes if k > j
      if ce((i, j)) && ce((j, k)) && ce((i, k))
    } yield Seq(i, j, k)
    tris.flatten.groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  test("per-node counts match brute force on random multigraphs") {
    val gen = for {
      n <- Gen.choose(0, 60)
      es <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 12L); b <- Gen.choose(0L, 12L)
      } yield (a, b)) // any orientation, dups, self-loops
    } yield es
    GenForAll.forAll(gen, n = 40) { es =>
      if (es.nonEmpty) {
        val got = Triangles.perNode(es.toDF("src", "dst"))
          .as[(Long, Long)].collect().toMap
        assert(got == brute(es), s"edges: $es")
      }
    }
  }

  test("empty and triangle-free graphs yield empty results") {
    assert(Triangles.perNode(Seq.empty[(Long, Long)].toDF("src", "dst"))
      .count() == 0)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Triangles.perNode(path).count() == 0)
  }

  test("K4 gives every vertex 3 triangles; orientation dedups exactly") {
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a != b } yield (a, b)
    val got = Triangles.perNode(k4.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }
}
