package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * partial sums. The edge relation is re-read per iteration — cache
  * it for in-memory iteration or persist ranks per round at
  * checkpoint cadence; with `scale = 10^12` and 85× multipliers the
  * headroom to Long.Max supports graphs to ~10^5 nodes per component
  * of mass, far beyond any rank mass a damped iteration concentrates.
  */
object PageRank {

  /** @param edges (src: long, dst: long) edge list
    * @param iters fixed iteration count (PageRank certification runs
    *              unroll the same count in SQL)
    * @param scale integer fixed-point unit for rank 1.0 */
  def run(edges: DataFrame, iters: Int, scale: Long = 1000000000000L)
      : DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    val base = lit(15L * scale / 100L)

    var ranks = nodes.withColumn("rank", lit(scale))
    for (_ <- 0 until iters) {
      val contrib = e
        .join(deg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank div out_deg").as("contrib"))
        .groupBy("node")
        .agg(sum("contrib").as("s"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (base + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
    }
    ranks
  }
}
