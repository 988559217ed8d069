package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.query.{CoreQueries, DedupQueries, DomainQueries, EventQueries, GraphQueries,
  MediaDedupQueries, MediaQueries, PipelineQueries, QualityQueries, TextQueries,
  TpchQueries, VectorQueries, WarehouseQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def oracleBacked
      : Map[String, ((SparkSession, String) => DataFrame, String)] =
    CoreQueries.all ++ DomainQueries.all ++ TextQueries.withOracle ++
      DedupQueries.withOracle ++
      MediaQueries.all ++ MediaDedupQueries.all ++ VectorQueries.all ++
      QualityQueries.all ++
      WarehouseQueries.all ++ GraphQueries.all ++ TpchQueries.all ++
      EventQueries.all ++ PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The end-to-end curation pipeline: quality + repetition gates
    * (native scan-level signals), benchmark decontamination (broadcast
    * gram anti-join), deterministic hash split, per-(split, lang)
    * token budgets — the engine's training-data story in one plan. */
  def entry(spark: SparkSession): DataFrame =
    TextQueries.curationPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    oracleBacked.map { case (k, (fn, _)) => k -> fn } ++
      TextQueries.rowsOnly ++ CoreQueries.rowsOnly ++
      EventQueries.rowsOnly ++ PipelineQueries.rowsOnly

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    oracleBacked.map { case (k, (_, sql)) => k -> sql }
}
