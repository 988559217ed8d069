package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §4 / builder-prompt scale
  * rules). AQE's skew-join split handles most runtime skew; explicit
  * salting remains the tool when one join key dominates so heavily
  * that even split partitions hotspot, or when AQE is unavailable
  * (e.g. inside `foreachBatch`).
  *
  * Shape: the big side derives a deterministic salt in [0, n) from a
  * spreading column (any high-cardinality column — row content, not
  * `rand()`, so retries/speculative tasks stay consistent); the small
  * side replicates each row n times. The join key becomes
  * (key, salt) — the hot key's rows spread over n reducers.
  */
object Skew {

  /** Inner equi-join `big.key = small.key` with an n-way salt.
    * `spreadCol` is a big-side column whose hash spreads the hot key's
    * rows (must not be the join key itself). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 spreadCol: String, n: Int): DataFrame = {
    require(n > 0, "salt factor must be positive")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(spreadCol)), lit(n.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Skewed-key report: top-k join keys by row count with their share —
    * the diagnostic that decides between broadcast, salting, and AQE.
    * One scan: the total is a window sum over the (already aggregated,
    * key-cardinality-sized) counts, not a second pass over the input. */
  def keySkewReport(df: DataFrame, key: String, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.groupBy(key).agg(count(lit(1)).as("rows"))
      .withColumn("share",
        col("rows") / sum("rows").over(Window.partitionBy()))
      .orderBy(desc("rows")).limit(topK)
  }
}
