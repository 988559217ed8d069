package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Batch PageRank over an edge DataFrame — the iterative-join workload
  * shape (each iteration: one equi-join edges⋈ranks + one aggregation
  * by destination), in ''scaled integer arithmetic'' so the result is
  * bit-reproducible under any partitioning: floating-point PageRank
  * sums contributions in shuffle order, integer sums are
  * order-independent, which is what lets the DuckDB oracle certify a
  * distributed run value-for-value.
  *
  * Semantics (documented, certified by the oracle):
  *  - ranks start at `scale` per node; after each iteration
  *    `rank = (15 * scale) / 100 + (85 * Σ contrib) / 100` with
  *    integer division at each step (damping 0.85);
  *  - a node's contribution per out-edge is `rank div out_degree`
  *    (integer division — the dust below `out_degree` is dropped);
  *  - dangling nodes contribute nothing (their mass leaks, the
  *    standard simplification);
  *  - multi-edges must be pre-collapsed by the caller if unwanted.
  *
  * Scale: ranks and degrees are partitioned on the node key; each
  * iteration shuffles only (node, contrib) pairs with map-side
  * partial sums. The edge/degree/node frames are persisted once for
  * the whole run, and ranks are eagerly `localCheckpoint`ed every
  * `checkpointInterval` iterations (and at the end), truncating
  * lineage so the physical plan stays bounded at ANY iteration count
  * — without it, 20 iterations nest 20 joins into one plan tree and
  * planning cost (and task re-computation on failure) grows with the
  * iteration number, the classic iterative-Spark failure mode.
  * Checkpointing cannot change a single bit of the result: the
  * integer recurrence is a pure function of the checkpointed values.
  *
  * Overflow headroom is ENFORCED, not just documented: total rank
  * mass is conserved-or-leaking (Σ rank ≤ n·scale at every
  * iteration), so the largest value the `85 * s` multiply can see is
  * n·scale; `run` requires n·scale ≤ Long.Max/100 and fails loudly
  * with the actual node count instead of wrapping silently under
  * non-ANSI mode (ADVICE r8). At the default scale that admits
  * ~9.2×10^4 nodes; pass a smaller `scale` for bigger graphs (e.g.
  * 10^6 still gives 6 exact decimal digits and admits ~9×10^10
  * nodes).
  */
object PageRank {

  /** @param edges (src: long, dst: long) edge list
    * @param iters fixed iteration count (PageRank certification runs
    *              unroll the same count in SQL)
    * @param scale integer fixed-point unit for rank 1.0
    * @param checkpointInterval eager-localCheckpoint cadence in
    *              iterations (lineage truncation; ≥ 1) */
  def run(edges: DataFrame, iters: Int, scale: Long = 1000000000000L,
          checkpointInterval: Int = 5): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(scale >= 1L, "scale must be >= 1")
    require(checkpointInterval >= 1, "checkpointInterval must be >= 1")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    if (iters == 0) return nodes.withColumn("rank", lit(scale))

    val eP = e.persist(StorageLevel.MEMORY_AND_DISK)
    val nodesP = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    val deg = eP.groupBy("src").agg(count(lit(1)).as("out_deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // One node-set-sized action up front: materializes the caches the
    // loop reuses anyway AND checks the multiply headroom (see above).
    val n = nodesP.count()
    require(n <= Long.MaxValue / 100L / scale,
      s"overflow headroom: $n nodes at scale=$scale exceeds " +
        s"Long range for the 85x damping multiply " +
        s"(max ${Long.MaxValue / 100L / scale} nodes); lower `scale`")
    val base = lit(15L * scale / 100L)

    var ranks = nodesP.withColumn("rank", lit(scale))
    var prevCkpt: DataFrame = null
    for (i <- 1 to iters) {
      val contrib = eP
        .join(deg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank div out_deg").as("contrib"))
        .groupBy("node")
        .agg(sum("contrib").as("s"))
      ranks = nodesP
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (base + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
      if (i % checkpointInterval == 0 || i == iters) {
        val ckpt = ranks.localCheckpoint(eager = true)
        if (prevCkpt != null) prevCkpt.unpersist()
        prevCkpt = ckpt
        ranks = ckpt
      }
    }
    // Final frame is materialized (eager checkpoint) — the loop inputs
    // can be dropped without recompute risk.
    eP.unpersist(); nodesP.unpersist(); deg.unpersist()
    ranks
  }
}
