package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-vertex triangle counting with degree-ranked edge orientation —
  * the standard trick that makes distributed triangle enumeration
  * survive skew: orienting every edge from its lower-(degree, id)
  * endpoint to the higher one turns the wedge join into a join on
  * out-neighborhoods of size O(√m) max (a celebrity node with 10^6
  * neighbors would otherwise build 10^12 wedges; oriented, its
  * out-degree is bounded by the number of HIGHER-degree nodes).
  * Each triangle is enumerated exactly once (its rank-lowest vertex
  * builds the wedge), then exploded to its three corners for the
  * per-vertex counts.
  *
  * Input edges are undirected pairs in any orientation; self-loops
  * and duplicates are dropped. Vertex ids must be non-negative and
  * fit in 32 bits (ranks pack as `degree << 32 | id` for cheap long
  * comparisons).
  */
object Triangles {

  /** (node, n_triangles) for every node on at least one triangle. */
  def perNode(edges: DataFrame): DataFrame = {
    // canonical undirected edge set: a < b, no loops, no dups
    val ce = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

    val deg = ce.select(col("a").as("node"))
      .union(ce.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

    // rank = (degree, id) packed into one long; orient low → high
    val ranked = ce
      .join(deg.select(col("node").as("a"),
        (shiftleft(col("deg"), 32) + col("a")).as("ra")), "a")
      .join(deg.select(col("node").as("b"),
        (shiftleft(col("deg"), 32) + col("b")).as("rb")), "b")
    val oriented = ranked.select(
      when(col("ra") < col("rb"), col("a")).otherwise(col("b")).as("u"),
      when(col("ra") < col("rb"), col("b")).otherwise(col("a")).as("v"),
      when(col("ra") < col("rb"), col("rb")).otherwise(col("ra")).as("rv"))

    // wedges at the rank-lowest corner: (u → v), (u → w), rank v < w;
    // closing edge must be v → w (rank orientation makes it so)
    val o1 = oriented.select(col("u"), col("v"), col("rv"))
    val o2 = oriented.select(col("u"), col("v").as("w"),
      col("rv").as("rw"))
    val tri = o1.join(o2, "u")
      .filter(col("rv") < col("rw"))
      .join(oriented.select(col("u").as("v"), col("v").as("w")),
        Seq("v", "w"))
      .select(col("u"), col("v"), col("w"))

    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
