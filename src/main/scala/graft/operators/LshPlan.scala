package graft.operators

/** Sizing discipline for the random-hyperplane LSH family
  * ([[graft.operators.Similarity.lshBucketPairs]] and everything built
  * on it: [[Dedup.embeddingNearDups]], [[DensityCluster.dbscanCosine]])
  * — the round-10 scale lesson ENCODED AS CODE rather than left in
  * PERF.md: holding the plane count fixed while the corpus grows k×
  * multiplies per-bucket occupancy k× and candidate PAIRS ~k²× per
  * bucket (k× relative to linear), which at the measured 100× leg
  * exhausted spill space; planes must track log2(n) so expected bucket
  * occupancy stays ~constant.
  *
  * The two sides of the trade, as pure functions of public LSH math
  * (Charikar 2002 random-hyperplane collision probability
  * `p = 1 − θ/π`):
  *  - '''candidate volume''': `2^planes` signatures per table, so
  *    expected occupancy `n / 2^planes`; [[planesFor]] picks
  *    `planes ≈ log2(n / targetBucket)` to hold occupancy at
  *    `targetBucket`, and [[requireFit]] fails LOUDLY when a fixed
  *    plane count implies occupancy beyond a caller's bound at the
  *    observed corpus size (the silent failure mode the 100× leg hit).
  *  - '''recall''': a true pair at cosine ≥ `threshold` misses one
  *    table with probability `1 − p^planes` and the whole index with
  *    `(1 − p^planes)^tables`; [[tablesFor]] inverts that for the
  *    smallest table count meeting `maxMissProb` — the
  *    `0.749^48 ≈ 1e-6` argument the q_dbscan_embeddings gate makes at
  *    (threshold 0.40, 3 planes), generalized.
  */
object LshPlan {

  /** Charikar collision probability of ONE random hyperplane for a
    * pair at exactly cosine = `threshold` (pairs above the threshold
    * collide more often, so every bound below is worst-case at the
    * threshold). */
  def collideProb(threshold: Double): Double = {
    require(threshold > -1.0 && threshold < 1.0,
      s"threshold must be in (-1, 1), got $threshold")
    1.0 - math.acos(threshold) / math.Pi
  }

  /** Probability that a true pair at the threshold shares NO bucket in
    * any of `tables` tables of `planes` hyperplanes (multiprobe only
    * lowers it — this is the probes = 0 worst case). */
  def missProb(threshold: Double, planes: Int, tables: Int): Double = {
    require(planes >= 1 && tables >= 1, "planes and tables must be >= 1")
    math.pow(1.0 - math.pow(collideProb(threshold), planes), tables)
  }

  /** Plane count holding expected per-table bucket occupancy at
    * `targetBucket` for an `n`-row corpus: `round(log2(n /
    * targetBucket))`, floored at 1. targetBucket ≈ 64 suits
    * verification-sized recall-certain corpora (the q_dbscan gate);
    * targetBucket = 1 is the production sparse regime (Scale100's
    * 12-planes-at-5k / 19-at-500k legs). */
  def planesFor(n: Long, targetBucket: Long = 64L): Int = {
    require(n >= 1, "corpus size must be >= 1")
    require(targetBucket >= 1, "targetBucket must be >= 1")
    math.max(1L, math.round(
      math.log(n.toDouble / targetBucket) / math.log(2.0))).toInt
  }

  /** Smallest table count whose worst-case miss probability at the
    * threshold is ≤ `maxMissProb` for the given plane count. Grows
    * only logarithmically in 1/maxMissProb, but EXPONENTIALLY in
    * planes (each plane divides per-table recall by ~p) — which is why
    * deep-plane production indexes pair with multiprobe instead of
    * more tables.
    *
    * Computed in LOG SPACE: `log(1 − p^planes)` via `log1p(−p^planes)`.
    * The naive `log(1.0 − p^planes)` rounds the miss probability to
    * exactly 1.0 once `p^planes < ~1.1e-16` (planes ≈ 54–80 at typical
    * thresholds), making `log = 0`, the ratio −∞, and `.toInt` saturate
    * to Int.MinValue — `.max(1)` then returned 1 table, the WORST
    * possible answer, while claiming the recall bound was met. log1p
    * keeps the region representable down to `p^planes ≈ 4.9e-324`;
    * past that (true underflow to 0, per-table recall numerically
    * zero) the table budget is genuinely unattainable and this fails
    * LOUDLY, like [[requireFit]]. */
  def tablesFor(threshold: Double, planes: Int,
                maxMissProb: Double = 1e-6): Int = {
    require(planes >= 1 && planes < 63, s"planes must be in [1, 62], got $planes")
    require(maxMissProb > 0 && maxMissProb < 1,
      s"maxMissProb must be in (0, 1), got $maxMissProb")
    val collidePow = math.pow(collideProb(threshold), planes)
    // per-table miss numerically 0 (collide prob 1): one table recalls
    // everything — log1p(-1) = -Inf below would divide to 0 anyway
    if (collidePow >= 1.0) return 1
    val logMiss = math.log1p(-collidePow)
    require(logMiss < 0.0,
      f"LSH table budget unattainable: at threshold $threshold%.3f the " +
        f"per-table collision probability over $planes planes underflows " +
        f"to 0 (per-table miss = 1.0), so NO table count reaches " +
        f"maxMissProb $maxMissProb%g; lower the plane count (planesFor) " +
        f"or pair deep planes with multiprobe instead of more tables")
    val tables = math.ceil(math.log(maxMissProb) / logMiss)
    require(tables <= Int.MaxValue.toDouble,
      f"LSH table budget unattainable: $tables%.3g tables needed at " +
        f"$planes planes / threshold $threshold%.3f for maxMissProb " +
        f"$maxMissProb%g; lower the plane count or accept higher miss")
    tables.toInt.max(1)
  }

  /** Loud guard for FIXED plane counts: fails when the expected
    * per-table bucket occupancy `n / 2^planes` exceeds
    * `maxExpectedBucket` — the configuration class that exhausted
    * spill at the measured 100× leg (occupancy, and with it candidate
    * pairs per bucket, grows with n while the plane count stands
    * still). Callers hitting this should size planes with
    * [[planesFor]] instead of raising the bound. */
  def requireFit(planes: Int, n: Long,
                 maxExpectedBucket: Long = 1024L): Unit = {
    require(planes >= 1 && planes < 63, s"planes must be in [1, 62]")
    val expected = n.toDouble / (1L << planes)
    require(expected <= maxExpectedBucket.toDouble,
      f"LSH under-planed for this corpus: $planes planes over $n rows " +
        f"implies expected bucket occupancy $expected%.0f > " +
        f"$maxExpectedBucket (candidate pairs grow with occupancy^2 " +
        f"per bucket — the measured 100x spill-exhaustion mode); size " +
        f"planes with LshPlan.planesFor(n, targetBucket) ≈ " +
        f"${planesFor(n, math.max(1L, maxExpectedBucket / 16))} instead")
  }
}
