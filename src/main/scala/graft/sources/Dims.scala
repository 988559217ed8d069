package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimension tables: the IANA TLD list (reference S4, App.java:48-56) and
  * the GeoIP/ASN range table (stand-in for the absent mmdb blobs, S5 /
  * .MISSING_LARGE_BLOBS).
  *
  * Both are broadcast-scale: ~1.5k TLD rows, O(1M) geo ranges. They ship
  * to executors once per job, never shuffle the fact side.
  */
object Dims {

  /** Minimal built-in TLD set for tests/demos; production passes the
    * full IANA file path to [[loadTlds]]. Includes the 2-level-relevant
    * entries the fixtures exercise (FIXTURES.md §2.1). */
  val defaultTlds: Set[String] = Set(
    "com", "net", "org", "co", "uk", "in", "de", "io", "ai", "fr", "ru",
    "gov", "edu", "info", "biz", "us", "eu", "jp", "cn", "br", "au", "it",
    "nl", "es", "ca", "ch", "se", "no", "pl", "me", "tv", "cc", "xyz",
    "app", "dev", "cloud", "online", "shop", "site", "store", "tech")

  /** Load a one-TLD-per-line file (IANA tlds-alpha-by-domain format,
    * lowercased, comments dropped). */
  def loadTlds(spark: SparkSession, path: String): Set[String] =
    spark.read.textFile(path).collect()
      .iterator.map(_.trim.toLowerCase)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .toSet

  /** TLD set as a single-column DataFrame for broadcast joins. */
  def tldDf(spark: SparkSession, tlds: Set[String]): DataFrame = {
    import spark.implicits._
    tlds.toSeq.sorted.toDF("tld")
  }

  /** Geo range-dim schema: (start_ip, end_ip, country, city, asn, as_name)
    * with start/end as inclusive long bounds. Ranges MUST be disjoint
    * (an mmdb export is a prefix trie, hence naturally disjoint) — the
    * range join is then 1:<=1 and needs no tie-break window. */
  def loadGeo(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema("start_ip LONG, end_ip LONG, country STRING, city STRING, asn LONG, as_name STRING")
      .csv(path)

  /** Sanity check for the disjointness contract. One sort instead of
    * the naive inequality self-join (which plans as an O(n^2) nested
    * loop — at a real ~3M-range MaxMind export that check would never
    * finish): after ordering by start_ip, ranges are disjoint iff
    * each start strictly exceeds the previous end and no start
    * repeats. */
  def assertDisjoint(geo: DataFrame): Unit = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("start_ip")
    val bad = geo.select(col("start_ip"), col("end_ip"))
      .withColumn("__prev_end", lag("end_ip", 1).over(w))
      .withColumn("__prev_start", lag("start_ip", 1).over(w))
      .filter(col("__prev_end").isNotNull &&
        (col("start_ip") <= col("__prev_end") ||
          col("start_ip") === col("__prev_start")))
      .count()
    require(bad == 0, s"geo dim has $bad overlapping/duplicate ranges")
  }
}
