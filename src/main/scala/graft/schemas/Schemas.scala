package graft.schemas

import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Explicit schemas for every table and input format (SURVEY §1.2: the
  * reference's formats are all hard-coded positional — production paths
  * here never infer).
  */
object Schemas {

  /** rdnsv4 output (README.md:19-42 DDL + engine ip_int convention).
    * firstSeen is declared but never written by the reference insert —
    * kept nullable. */
  val rdnsv4: StructType = StructType(Seq(
    StructField("ip8", StringType, false),
    StructField("ip16", StringType, false),
    StructField("ip24", StringType, false),
    StructField("ipAddress", StringType, false),
    StructField("ip_int", LongType, false),
    StructField("p1", StringType, false), StructField("p2", StringType, false),
    StructField("p3", StringType, false), StructField("p4", StringType, false),
    StructField("p5", StringType, false), StructField("p6", StringType, false),
    StructField("p7", StringType, false),
    StructField("country", StringType, false),
    StructField("city", StringType, false),
    StructField("asn", LongType, false),
    StructField("as_name", StringType, false),
    StructField("source", StringType, false),
    StructField("sourceRecordType", StringType, false),
    StructField("firstSeen", TimestampType, true),
    StructField("lastSeen", TimestampType, false),
    StructField("updatedAt", TimestampType, false)))

  /** subdomains output (README.md:46-60). */
  val subdomains: StructType = StructType(Seq(
    StructField("p1", StringType, false), StructField("p2", StringType, false),
    StructField("p3", StringType, false), StructField("p4", StringType, false),
    StructField("p5", StringType, false), StructField("p6", StringType, false),
    StructField("p7", StringType, false),
    StructField("source", StringType, false),
    StructField("sourceRecordType", StringType, false),
    StructField("firstSeen", TimestampType, true),
    StructField("lastSeen", TimestampType, false),
    StructField("updatedAt", TimestampType, false)))

  /** cnames output (README.md:63-75). */
  val cnames: StructType = StructType(Seq(
    StructField("target", StringType, false),
    StructField("apexDomain", StringType, false),
    StructField("domain", StringType, false),
    StructField("source", StringType, false),
    StructField("firstSeen", TimestampType, true),
    StructField("lastSeen", TimestampType, false),
    StructField("updatedAt", TimestampType, false)))

  /** Geo range dim (stand-in for the absent mmdb, FIXTURES.md §2.2). */
  val geoRanges: StructType = StructType(Seq(
    StructField("start_ip", LongType, false),
    StructField("end_ip", LongType, false),
    StructField("country", StringType, true),
    StructField("city", StringType, true),
    StructField("asn", LongType, true),
    StructField("as_name", StringType, true)))

  // Typed boundaries (Dataset[T] where type safety helps; the engine's
  // primary API stays DataFrame per SURVEY §1.2).
  final case class RdnsRecord(
      ip8: String, ip16: String, ip24: String, ipAddress: String,
      ip_int: Long, p1: String, p2: String, p3: String, p4: String,
      p5: String, p6: String, p7: String, country: String, city: String,
      asn: Long, as_name: String, source: String, sourceRecordType: String,
      firstSeen: Option[Timestamp], lastSeen: Timestamp, updatedAt: Timestamp)

  final case class SubdomainRecord(
      p1: String, p2: String, p3: String, p4: String, p5: String,
      p6: String, p7: String, source: String, sourceRecordType: String,
      firstSeen: Option[Timestamp], lastSeen: Timestamp, updatedAt: Timestamp)

  final case class CnameRecord(
      target: String, apexDomain: String, domain: String, source: String,
      firstSeen: Option[Timestamp], lastSeen: Timestamp, updatedAt: Timestamp)
}
