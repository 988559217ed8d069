package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed data-source tables — the co-located join layout.
  *
  * The reference's storage engines route rows by key (Cassandra's
  * Murmur3 token partitioner, ref `App.java:232-246`; ClickHouse
  * `ORDER BY domain`), which is what makes their point lookups and
  * merges shuffle-free. Spark's equivalent for JOINS is bucketing:
  * both fact tables are written pre-hashed into the same number of
  * buckets on the join key, so a later sort-merge join reads
  * co-located buckets and needs NO exchange on either side — at
  * 100 TB this deletes the two largest shuffles of a fact-fact join,
  * which is exactly the trade (pay once at write, join forever free)
  * a recurring pipeline wants.
  */
object Bucketing {

  /** Write `df` as a bucketed + per-bucket-sorted parquet table.
    *
    * The frame is first repartitioned into `buckets` partitions on the
    * bucket key: `repartition` and bucket assignment use the SAME
    * murmur3 `pmod` hash, so every write task holds exactly one
    * bucket and emits ONE file — the layout under which the reader
    * also reports the per-bucket sort order (multi-file buckets lose
    * the sort guarantee and re-sort under a join, though they still
    * avoid the exchange).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    buckets: Int, key: String,
                    sortCols: Seq[String]): Unit = {
    require(buckets > 0, "buckets must be positive")
    require(sortCols.nonEmpty, "sortCols must not be empty")
    df.repartition(buckets, col(key))
      .write.format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Join two same-bucket-count tables on their bucket keys. The
    * `merge` hint pins sort-merge (a broadcast would hide the
    * co-location; at real fact-fact scale SMJ is also what Spark
    * picks). Plan contains no ShuffleExchange below the join —
    * asserted in BucketingSpec. */
  def coLocatedJoin(s: SparkSession, leftTable: String, leftKey: String,
                    rightTable: String, rightKey: String): DataFrame =
    // side aliases keep the join condition unambiguous when both
    // tables bucket on the SAME column name (the natural fact-fact
    // case, e.g. both keyed on "domain")
    s.table(leftTable).as("l").hint("merge")
      .join(s.table(rightTable).as("r"),
        col(s"l.$leftKey") === col(s"r.$rightKey"))
}
