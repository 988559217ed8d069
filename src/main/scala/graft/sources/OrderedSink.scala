package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** K1-analog sink: the reference requires key-ordered writes for SSTable
  * performance (README.md:82 — out-of-order keys burn CPU). The Spark
  * equivalent is clustered parquet: repartition on the partition key,
  * sort within partitions by the clustering columns, write.
  *
  * At 100 TB this is the load-bearing layout decision: downstream
  * point/prefix reads prune on the partition key stats and stream
  * clustering-ordered row groups, mirroring Cassandra's
  * (partition key; clustering) contract without a global sort.
  */
object OrderedSink {

  def write(df: DataFrame, path: String,
            partitionKeys: Seq[String], clusteringKeys: Seq[String],
            numPartitions: Option[Int] = None): Unit = {
    val keyCols = partitionKeys.map(col)
    val repartitioned = numPartitions match {
      case Some(n) => df.repartition(n, keyCols: _*)
      case None    => df.repartition(keyCols: _*)
    }
    repartitioned
      .sortWithinPartitions((partitionKeys ++ clusteringKeys).map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** The three reference tables with their DDL key layouts
    * (README.md:40,59,73). */
  def writeRdnsv4(df: DataFrame, path: String): Unit =
    write(df, path, Seq("ip8"),
      Seq("ip16", "ip24", "ip_int", "p1", "p2", "p3", "p4", "p5", "p6", "p7"))

  def writeSubdomains(df: DataFrame, path: String): Unit =
    write(df, path, Seq("p1", "p2", "p3"), Seq("p4", "p5", "p6", "p7"))

  def writeCnames(df: DataFrame, path: String): Unit =
    write(df, path, Seq("target"), Seq("apexDomain", "domain"))
}
