package graft.operators

import graft.SparkTestBase

class KCenterSpec extends SparkTestBase {
  import spark.implicits._

  /** Single-threaded greedy reference with the operator's exact
    * arithmetic: index-ascending double fold, (dvv + dcc) - 2*dot. */
  private def reference(vecs: Seq[(Long, Seq[Float])], k: Int)
      : Seq[(Int, Long, Double)] = {
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.indices.foldLeft(0.0)((acc, i) =>
        acc + a(i).toDouble * b(i).toDouble)
    val dvv = vecs.map { case (id, v) => id -> dot(v, v) }.toMap
    val byId = vecs.toMap
    val seed = vecs.map(_._1).min
    // picked ids leave the candidate set (operator semantics)
    var d = vecs.filter(_._1 != seed).map { case (id, v) =>
      id -> ((dvv(id) + dvv(seed)) - 2.0 * dot(v, byId(seed)))
    }.toMap
    val out = Seq.newBuilder[(Int, Long, Double)]
    out += ((0, seed, 0.0))
    for (r <- 1 until k) {
      val (cid, cd) = d.toSeq.minBy { case (id, dd) => (-dd, id) }
      out += ((r, cid, cd))
      d = (d - cid).map { case (id, dd) =>
        id -> math.min(dd,
          (dvv(id) + dvv(cid)) - 2.0 * dot(byId(id), byId(cid)))
      }
    }
    out.result()
  }

  private def run(vecs: Seq[(Long, Seq[Float])], k: Int) =
    KCenter.greedy(vecs.toDF("vec_id", "embedding"), "vec_id",
        "embedding", k)
      .as[(Int, Long, Double)].collect().toSeq.sortBy(_._1)

  test("three well-separated clusters yield one center per cluster") {
    val vecs = Seq[(Long, Seq[Float])](
      (1L, Seq(0f, 0f)), (2L, Seq(0.1f, 0f)),
      (10L, Seq(100f, 0f)), (11L, Seq(100f, 0.1f)),
      (20L, Seq(0f, 100f)), (21L, Seq(0.1f, 100f)))
    val got = run(vecs, 3)
    assert(got == reference(vecs, 3))
    // one pick per cluster: seed 1, then the farthest member of each
    // far cluster ((100, 0.1) edges out (100, 0) by the 0.1 offset)
    assert(got.map(_._2).toSet == Set(1L, 11L, 21L))
  }

  test("k = 1 returns only the smallest-id seed at distance 0") {
    assert(run(Seq((5L, Seq(1f, 2f)), (3L, Seq(0f, 0f))), 1) ==
      Seq((0, 3L, 0.0)))
  }

  test("matches the reference bit-for-bit on random vectors") {
    val rnd = new scala.util.Random(17)
    val vecs = (0L until 40L).map(i =>
      i -> Seq.fill(8)(rnd.nextFloat() * 2f - 1f))
    val got = run(vecs, 7)
    assert(got == reference(vecs, 7)) // == on raw doubles, no epsilon
  }

  test("duplicates: picked ids never repeat; zero-distance dups still fill k") {
    val vecs = Seq[(Long, Seq[Float])](
      (1L, Seq(0f)), (2L, Seq(0f)), (3L, Seq(9f)), (4L, Seq(9f)))
    val got = run(vecs, 4)
    assert(got == reference(vecs, 4))
    assert(got.map(_._2).distinct.size == 4, "all picks distinct")
    assert(got(1)._2 == 3L, "farthest distinct point first, lower id")
    assert(got.drop(2).forall(_._3 == 0.0),
      "remaining picks are zero-distance duplicates")
  }

  test("k beyond the distinct-id count fails loudly") {
    val ex = intercept[IllegalArgumentException] {
      run(Seq((1L, Seq(0f)), (2L, Seq(1f))), 3)
    }
    assert(ex.getMessage.contains("exceeds the number of distinct ids"))
  }
}
