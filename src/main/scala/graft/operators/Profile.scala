package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality reconnaissance pass every
  * large-scale ingest runs before trusting a table: per column, row
  * count, null count, EXACT distinct cardinality, and min/max
  * (rendered as strings so one frame carries every column type).
  *
  * Scale shape: one aggregate per column over a single-column pruned
  * scan, unioned — each leg reads exactly one parquet column (the
  * `ReadSchema` shows one field per leg) and aggregates map-side, so
  * the full profile costs k column scans and k 1-row exchanges, never
  * a row-wise expand of the whole table (the multi-countDistinct
  * single-pass alternative multiplies every row k× through Expand
  * before the partial aggregate — strictly more bytes moved for wide
  * profiles). min/max casts AFTER aggregating on the native type, so
  * numeric order is preserved ("9" < "10" stays true).
  *
  * Exact distincts keep the result oracle-checkable; production
  * profiles at 100 TB swap in approx_count_distinct (the engine's
  * q_approx_distinct gate certifies that path) by passing
  * `approx = true`. */
object Profile {

  def columns(df: DataFrame, cols: Seq[String],
              approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val legs = cols.map { c =>
      df.select(col(c))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col(c)).as("__present"),
          (if (approx) approx_count_distinct(col(c))
           else count_distinct(col(c))).as("n_distinct"),
          min(col(c)).cast("string").as("min_value"),
          max(col(c)).cast("string").as("max_value"))
        .select(lit(c).as("column_name"), col("n_rows"),
          (col("n_rows") - col("__present")).as("n_null"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }
    legs.reduce(_ unionByName _).orderBy("column_name")
  }
}
