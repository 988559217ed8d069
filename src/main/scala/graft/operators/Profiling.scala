package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column null counts, cardinality, and value
  * bounds — the first pass any data pipeline runs over a new corpus.
  *
  * ONE aggregation job over the input produces every column's metrics
  * (a single wide row, unpivoted with `stack`); no per-column scans.
  * Exact distinct counts expand the aggregate per column (Spark's
  * multi-distinct rewrite) — at corpus scale pass
  * `exactDistinct = false` for one-pass HLL sketches instead.
  */
object Profiling {

  def profile(df: DataFrame, columns: Seq[String],
              exactDistinct: Boolean = true): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = columns.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = columns.flatMap { c =>
      Seq(lit(c), col(s"__nulls_$c"), col(s"__dist_$c"),
        col(s"__min_$c"), col(s"__max_$c"))
    }
    wide.select(stack(
        Seq(lit(columns.size)) ++ stacked: _*)
      .as(Seq("col_name", "n_nulls", "n_distinct", "min_v", "max_v")))
  }
}
