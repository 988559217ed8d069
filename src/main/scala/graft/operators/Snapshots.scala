package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — dataset-versioning support for a recurring
  * pipeline: classify every key between two snapshots of a keyed
  * table as added / removed / changed (unchanged rows drop out).
  *
  * This is the audit step a daily training-data refresh needs ("what
  * did the new crawl + filters actually change?") and generalizes the
  * reference's day-over-day `comm` comparisons (ref
  * `daily_certstream_download.sh:75-93`) from set membership to
  * content revisions.
  *
  * Scale shape: each side reduces to (key, 16-byte fingerprint) at
  * the scan — wide payloads never cross the wire — then ONE
  * full-outer hash join on the key (one shuffle per side; zero if
  * both snapshots are bucketed on the key, [[graft.sources.Bucketing]]).
  */
object Snapshots {

  /** Rows whose `key` membership or fingerprint differs between the
    * snapshots: (key, status) with status in added|removed|changed.
    * `fingerprintOf` maps a snapshot's payload to the compared value
    * (e.g. the text column, or a concat of the columns that matter —
    * caller policy); it is md5-hashed so equality is byte equality. */
  def diff(oldDf: DataFrame, newDf: DataFrame, key: String,
           fingerprintOf: DataFrame => Column): DataFrame = {
    def fp(df: DataFrame): Column = md5(fingerprintOf(df).cast("binary"))
    // Presence is tracked separately from the fingerprint: a NULL
    // payload hashes to NULL, which must read as "present with null
    // content" (null-safe compared), not as a missing key.
    val o = oldDf.select(col(key), fp(oldDf).as("__fp_old"),
      lit(true).as("__in_old"))
    val n = newDf.select(col(key), fp(newDf).as("__fp_new"),
      lit(true).as("__in_new"))
    o.join(n, Seq(key), "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(!(col("__fp_old") <=> col("__fp_new")), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col(key), col("status"))
  }
}
