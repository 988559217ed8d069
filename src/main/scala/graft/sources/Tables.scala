package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros, unix_micros}
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
    * encoding as a timestamp directly).
    *
    * µs-alignment note (ADVICE r8): the typed branches reconstruct
    * nanos as `unix_micros * 1000`, which is lossless exactly because
    * a typed parquet encoding (timestamp[us] / TIMESTAMP_NTZ) cannot
    * carry sub-µs bits in the first place — Spark's timestamp types
    * are µs-resolution, so there is nothing to truncate. Only the
    * nanos-as-INT64 encoding can carry sub-µs precision, and that
    * branch passes the long through untouched. An encoding flip
    * therefore cannot silently change hashes: any query that divides
    * by 1000 sees identical µs values under either encoding. */
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

  /** `events` with derived time columns computed straight from the
    * raw file encoding — no long↔timestamp round-trip:
    *   - `ts`  — raw epoch-NANOS long (the engine's standard contract,
    *             same value `load` produces)
    *   - `ets` — epoch-µs TIMESTAMP (UTC session)
    *   - `us`  — epoch-µs long (`ts div 1000` under the long encoding;
    *             `unix_micros` directly under typed encodings)
    * Time-semantics queries should read `ets` here instead of
    * re-deriving `timestamp_micros(ts div 1000)` from the normalized
    * long: when the file ships a typed encoding that round-trip costs
    * a measured ~1.7× on session-window aggregation (VERDICT r8
    * item 1 A/B, PERF.md round-9). Catalyst prunes whichever derived
    * column a query doesn't select, so there is no cost to exposing
    * both. Values are bit-identical to the round-trip form under
    * either encoding (µs truncation is `div 1000` for the long form;
    * typed forms are already µs-resolution). */
  def loadEventsTs(spark: SparkSession, sfDir: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    def withDerived(df: DataFrame, typed: Column): DataFrame =
      df.withColumn("ets", typed)
        .withColumn("us", unix_micros(typed))
        .withColumn("ts", unix_micros(typed) * 1000L)
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ets", timestamp_micros(expr("ts div 1000")))
          .withColumn("us", expr("ts div 1000"))
      case TimestampType    => withDerived(df, col("ts"))
      case TimestampNTZType => withDerived(df, col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }

  /** Register every table as a temp view so `spark.sql` queries match the
    * DuckDB oracle's table naming. Idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
