package graft.operators

import graft.SparkTestBase

class DensityClusterSpec extends SparkTestBase {
  import spark.implicits._

  // two orthogonal dense blobs, one border point leaning toward blob A,
  // and far-off noise — 8-dim unit-ish vectors, cosine threshold 0.8
  private def vec(parts: (Int, Float)*): Array[Float] = {
    val a = new Array[Float](8)
    parts.foreach { case (i, v) => a(i) = v }
    a
  }

  private val fixture = Seq(
    // blob A: axis 0 with small axis-1 jitter (pairwise cos > 0.99)
    1L -> vec(0 -> 1f),
    2L -> vec(0 -> 1f, 1 -> 0.05f),
    3L -> vec(0 -> 1f, 1 -> -0.05f),
    // blob B: axis 2 (orthogonal to A)
    10L -> vec(2 -> 1f),
    11L -> vec(2 -> 1f, 3 -> 0.05f),
    12L -> vec(2 -> 1f, 3 -> -0.05f),
    // border: cos ~0.89 to blob A members, only ONE such neighbor set
    20L -> vec(0 -> 1f, 4 -> 0.5f),
    // noise: orthogonal to everything
    30L -> vec(5 -> 1f))

  test("cores, borders, noise, and min-cluster assignment on planted blobs") {
    val df = fixture.toDF("vec_id", "embedding")
    // planes=1, tables=64: per-pair miss (1 - p)^64 with p >= 0.5 for
    // any non-negative-cos pair — recall certain for this fixture
    val got = DensityCluster.dbscanCosine(df, "vec_id", "embedding",
        threshold = 0.8, minPts = 3, numPlanes = 1, tables = 64,
        dims = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        r.getLong(2)))).toMap
    // blob members see 2 same-blob neighbors (+self = 3) -> core
    for (id <- Seq(1L, 2L, 3L))
      assert(got(id) == (("core", 1L)), s"id=$id got ${got(id)}")
    for (id <- Seq(10L, 11L, 12L))
      assert(got(id) == (("core", 10L)), s"id=$id got ${got(id)}")
    // the leaner has 3 blob-A neighbors (+self = 4): actually core,
    // joined to blob A's component
    assert(got(20L) == (("core", 1L)))
    assert(got(30L) == (("noise", -1L)))
  }

  test("true border point joins the smallest core cluster") {
    // border: within eps of exactly ONE core (minPts unreachable)
    val df = (fixture :+ (21L -> vec(0 -> 1f, 4 -> 1.1f)))
      .toDF("vec_id", "embedding")
    val got = DensityCluster.dbscanCosine(df, "vec_id", "embedding",
        threshold = 0.8, minPts = 4, numPlanes = 1, tables = 64,
        dims = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        r.getLong(2)))).toMap
    // at minPts=4: blob A = {1,2,3,20} is mutually dense: 20's cos to
    // members ~0.89 >= 0.8 -> N(1) = {2,3,20,self} = 4 -> core; blob B
    // members have N=3 -> NOT core -> each B point is within eps of
    // only non-cores -> noise
    for (id <- Seq(10L, 11L, 12L))
      assert(got(id)._1 == "noise", s"id=$id got ${got(id)}")
    for (id <- Seq(1L, 2L, 3L, 20L))
      assert(got(id)._1 == "core", s"id=$id got ${got(id)}")
    // 21 leans further out: cos to A members ~0.67 < 0.8, but cos to
    // 20 = (1 + 0.55) / (sqrt(1.25) * sqrt(2.21)) ~ 0.93 -> within
    // eps of exactly one core (20) and nothing else -> border, and it
    // inherits 20's cluster (blob A's component min = 1)
    assert(got(21L) == (("border", 1L)))
    assert(got(30L) == (("noise", -1L)))
  }
}
