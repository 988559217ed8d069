package graft.operators

/** Tiny deterministic Lloyd's k-means for IVF coarse-quantizer
  * training. The sample is DRIVER-SIDED BY DESIGN: IVF trains on a
  * bounded sample (nlist centroids from <= trainSampleLimit vectors —
  * the FAISS shape), so the training set is dim-table sized no matter
  * the corpus; assignment stays a distributed scan projection against
  * the broadcast centroids.
  *
  * Deterministic: seeded splitmix index selection for init, fixed
  * iteration count, left-to-right accumulation. Empty clusters keep
  * their previous centroid.
  */
object KMeansLite {

  private def splitmix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** `k` centroids over `points` (each a dense double vector of equal
    * length). Returns min(k, distinct init points) centroids. */
  def fit(points: Array[Array[Double]], k: Int, iters: Int = 8,
          seed: Long = 42L): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means needs a non-empty sample")
    val n = points.length
    val dims = points(0).length
    // seeded distinct index selection for initial centroids
    val picked = scala.collection.mutable.LinkedHashSet.empty[Int]
    var s = seed
    while (picked.size < math.min(k, n)) {
      s = splitmix(s)
      picked += java.lang.Math.floorMod(s, n.toLong).toInt
    }
    var centroids = picked.toArray.map(i => points(i).clone())

    def sqDist(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < dims) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }

    var iter = 0
    while (iter < iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dims))
      val counts = new Array[Long](centroids.length)
      var p = 0
      while (p < n) {
        val v = points(p)
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < centroids.length) {
          val d = sqDist(v, centroids(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dims) { sums(best)(i) += v(i); i += 1 }
        counts(best) += 1
        p += 1
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else {
          val m = new Array[Double](dims)
          var i = 0
          while (i < dims) { m(i) = sums(c)(i) / counts(c); i += 1 }
          m
        }
      }
      iter += 1
    }
    centroids
  }
}
