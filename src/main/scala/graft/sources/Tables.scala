package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md) and for
  * the engine's dimension tables.
  *
  * All test tables are single parquet files under the sf-dir (TESTDATA.md);
  * at production scale these would be partitioned parquet table roots —
  * the reader API is identical, so nothing here changes at 100 TB.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** The generated `events.ts` has shipped as BOTH parquet
    * nanos-as-INT64 (read as long under
    * spark.sql.legacy.parquet.nanosAsLong) and as timestamp[us]
    * (read as TIMESTAMP_NTZ) across driver testdata versions. Query
    * code standardizes on the raw-long form (epoch NANOS) — the form
    * an ingest pipeline sees before timestamp semantics are applied —
    * so normalize the typed encodings back to it here, at the one
    * load point. Sessions pin UTC, making the NTZ→LTZ cast a no-op
    * rebase; the oracle side is untouched (DuckDB reads either
    * encoding as a timestamp directly). */
  private def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * 1000L)
      case TimestampNTZType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * 1000L)
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }

  /** Register every table as a temp view so `spark.sql` queries match the
    * DuckDB oracle's table naming. Idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
