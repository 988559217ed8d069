package graft.operators

import graft.SparkTestBase

class PowerIterationSpec extends SparkTestBase {
  import spark.implicits._

  /** Single-threaded mirror of the integer recurrence. */
  private def reference(vecs: Seq[Seq[Float]], dims: Int, iters: Int,
                        qscale: Long, vscale: Long): Seq[(Long, Long)] = {
    val q = vecs.filter(_.size == dims)
      // HALF_UP away from zero — math.round would send -0.5 to 0
      // where both engines' round() sends it to -1
      .map(_.map(x => BigDecimal(x * qscale.toDouble)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val g = Array.ofDim[Long](dims, dims)
    for (row <- q; i <- 0 until dims; j <- 0 until dims)
      g(i)(j) += row(i) * row(j)
    var v = Array.fill(dims)(vscale)
    for (_ <- 1 to iters) {
      val raw = Array.tabulate(dims)(i =>
        (0 until dims).map(j => g(i)(j) * v(j)).sum)
      val m = raw.map(math.abs).max
      v = raw.map(r => math.signum(r) * (math.abs(r) * vscale / m))
    }
    (1 to dims).map(i => (i.toLong, v(i - 1)))
  }

  private def run(vecs: Seq[Seq[Float]], dims: Int, iters: Int) =
    PowerIteration.dominantDirection(
        vecs.map(Tuple1(_)).toDF("embedding"), "embedding", dims, iters)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)

  test("a planted dominant axis wins and hits max magnitude") {
    // 20 vectors along +x with tiny noise on y
    val vecs = (0 until 20).map(i =>
      Seq(1.0f, if (i % 2 == 0) 0.05f else -0.05f, 0.0f))
    val got = run(vecs, 3, 3)
    assert(got == reference(vecs, 3, 3, 64L, 10000L))
    assert(got.head == ((1L, 10000L)), "x carries the mass")
    assert(math.abs(got(1)._2) < 500L && got(2)._2 == 0L)
  }

  test("matches the reference on random vectors, several depths") {
    val rnd = new scala.util.Random(41)
    val vecs = (0 until 30).map(_ => Seq.fill(6)(rnd.nextFloat() * 2 - 1))
    for (iters <- Seq(1, 2, 4))
      assert(run(vecs, 6, iters) ==
        reference(vecs, 6, iters, 64L, 10000L), s"iters=$iters")
  }

  test("wrong-width rows are excluded, not corrupting") {
    val vecs = Seq(Seq(1f, 0f), Seq(1f, 0f, 9f), Seq(0.5f, 0f))
    val got = run(vecs, 2, 2)
    assert(got == reference(vecs, 2, 2, 64L, 10000L))
    assert(got == Seq((1L, 10000L), (2L, 0L)))
  }

  test("a degenerate corpus (empty, or no row at the declared dims) " +
      "fails loudly, not with a silently empty frame") {
    // the guard's count() is also the lazy checkpoint's materializing
    // action (one job for guard + checkpoint, verdict r12 item 8)
    val exEmpty = intercept[IllegalArgumentException] {
      run(Seq.empty, 2, 1)
    }
    assert(exEmpty.getMessage.contains("degenerate"), exEmpty.getMessage)
    // non-empty input, but EVERY row fails the size(qv) === dims filter
    val exWidth = intercept[IllegalArgumentException] {
      run(Seq(Seq(1f, 2f, 3f), Seq(4f)), 2, 1)
    }
    assert(exWidth.getMessage.contains("dims = 2"), exWidth.getMessage)
  }

  test("an all-zero corpus fails loudly, not with wrapped garbage") {
    // the guard is an inline assert_true riding the lazy plan (one job
    // per iteration, no driver scalar fetch), so it surfaces as a
    // Spark execution error carrying the guard message
    val ex = intercept[Exception] {
      run(Seq(Seq(0f, 0f)), 2, 1)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("zero vector")), messages(ex))
  }
}
