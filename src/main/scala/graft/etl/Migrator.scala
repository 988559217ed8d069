package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{DomainFunctions, IpFunctions}

/** The reference's core CSV -> three-table pipeline (App.java:341-478)
  * as a declarative Spark job.
  *
  * Behavior parity notes (all observable semantics, none of the HOW):
  *  - arity < 3 rows silently dropped (App.java:346);
  *  - invalid domains: the engine adopts the Go cleaner's semantics and
  *    KEEPS successfully repaired domains (`*.`/`\"` prefix strip); the
  *    Java path drops even repaired ones via an unconditional return
  *    (App.java:364) — divergence documented in SURVEY §7.4;
  *  - recordType != "A" means CNAME (App.java:389); the cnames row is
  *    observably (target=ip field, apexDomain=ip field, domain) because
  *    the reference reassigns apexDomain to the target before the write
  *    (App.java:393,443) — quirk preserved;
  *  - A-records write BOTH an rdnsv4 row and a subdomains row;
  *  - unparseable IPv4 on the A-branch drops the row (App.java:395-400);
  *  - GeoIP misses leave country=""/city=""/asn=0/as_name="" (not null);
  *  - firstSeen exists in the DDL but is never written (null here);
  *    lastSeen/updatedAt are ingest-time timestamps (T3).
  *
  * Scale: one broadcast join for TLD membership, one broadcast range
  * join for GeoIP, zero fact-side shuffles until the ordered sink.
  */
object Migrator {

  final case class Outputs(
      rdnsv4: DataFrame, subdomains: DataFrame, cnames: DataFrame)

  // validation+repair as codegen'd columns (no UDF in the bulk path)
  private def cleanCol(lines: DataFrame) =
    Cleaner.validOrRepairedCol(lines) _

  /** Parse raw massdns CSV lines (`domain,recordType,ip`) into the
    * validated, domain-parts-annotated intermediate. */
  def parse(lines: DataFrame, tlds: Set[String]): DataFrame = {
    // Java split("\\,") drops trailing empty fields
    val parts = DomainPartsTransform.splitLikeJava(col("value"), ",")
    val parsed = lines
      .withColumn("__p", parts)
      .filter(size(col("__p")) >= 3)                       // F1
      .select(
        element_at(col("__p"), 1).as("raw_domain"),
        element_at(col("__p"), 2).as("recordType"),
        element_at(col("__p"), 3).as("ipStr"))
      .withColumn("domain", cleanCol(lines)(col("raw_domain")))  // F2+F3 (Go)
      .filter(col("domain").isNotNull)
      .drop("raw_domain")
    DomainPartsTransform.withDomainParts(parsed, "domain", tlds)
      .filter(col("dp_success"))                           // X1 failure drop
  }

  /** Full pipeline: intermediate -> three output tables. `geo` is the
    * broadcast GeoIP range dim (Dims.loadGeo schema) or None to
    * null-enrich (the mmdb-absent configuration). */
  /** `cacheParsed`: set true only when materializing more than one of
    * the three outputs in the same job (MigratorJob does); a
    * single-output consumer would just leak executor memory. At 100 TB
    * prefer a persisted staging table over executor cache. */
  def run(lines: DataFrame, tlds: Set[String], geo: Option[DataFrame],
          source: String, cacheParsed: Boolean = false): Outputs = {
    val parsedRaw = parse(lines, tlds)
    val parsed = if (cacheParsed) parsedRaw.cache() else parsedRaw
    fromParsed(parsed, geo, source)
  }

  /** 100 TB variant of [[run]]: materialize the parsed intermediate as
    * a parquet STAGING TABLE instead of executor cache. At scale the
    * parsed fan-out (three downstream consumers) doesn't fit in
    * executor memory, spills thrash, and a lost executor recomputes the
    * whole lineage; a staged table is scanned three times with column
    * pruning and survives failures. */
  def runStaged(lines: DataFrame, tlds: Set[String], geo: Option[DataFrame],
                source: String, stagingDir: String): Outputs = {
    parse(lines, tlds).write.mode("overwrite").parquet(stagingDir)
    fromParsed(lines.sparkSession.read.parquet(stagingDir), geo, source)
  }

  /** The three output tables from the validated intermediate. */
  private def fromParsed(parsed: DataFrame, geo: Option[DataFrame],
                         source: String): Outputs = {
    val isCname = col("recordType") =!= "A"                // F4

    // ---- cnames branch (quirk: apexDomain column = target) ----
    val cnames = parsed.filter(isCname)
      .filter(length(col("ipStr")) > 0)                    // F6 on target
      .select(
        col("ipStr").as("target"),
        col("ipStr").as("apexDomain"),
        col("domain"),
        lit(source).as("source"),
        lit(null).cast("timestamp").as("firstSeen"),
        current_timestamp().as("lastSeen"),
        current_timestamp().as("updatedAt"))

    // ---- A branch: parse IP, derive blocks, geo-enrich ----
    // shared base for BOTH A-record outputs (rdnsv4, subdomains), so
    // the F5/F6 filter chain exists exactly once
    val aBase = parsed.filter(!isCname)
      .withColumn("ip_int", IpFunctions.ipToLongCol(col("ipStr")))
      .filter(col("ip_int").isNotNull)                     // F5
      .filter(length(col("apex")) > 0)                     // F6
    val aRows = aBase
      .withColumn("ip8_int", IpFunctions.ipBlockCol(col("ip_int"), 8))
      .withColumn("ip16_int", IpFunctions.ipBlockCol(col("ip_int"), 16))
      .withColumn("ip24_int", IpFunctions.ipBlockCol(col("ip_int"), 24))

    val enriched = geo match {
      case Some(g) =>
        // bucketed equi-range join, not a raw `between` broadcast
        // (which plans as nested-loop: every row x every range — a real
        // MaxMind dim has ~3M ranges)
        graft.operators.RangeJoin.bucketed(
            aRows, g, col("ip_int"), "start_ip", "end_ip")
          .drop("start_ip", "end_ip")
      case None =>
        aRows.withColumn("country", lit(null).cast("string"))
          .withColumn("city", lit(null).cast("string"))
          .withColumn("asn", lit(null).cast("long"))
          .withColumn("as_name", lit(null).cast("string"))
    }

    val rdnsv4 = enriched.select(
      IpFunctions.longToIpCol(col("ip8_int")).as("ip8"),
      IpFunctions.longToIpCol(col("ip16_int")).as("ip16"),
      IpFunctions.longToIpCol(col("ip24_int")).as("ip24"),
      col("ipStr").as("ipAddress"),
      col("ip_int"),
      col("p1"), col("p2"), col("p3"), col("p4"),
      col("p5"), col("p6"), col("p7"),
      coalesce(col("country"), lit("")).as("country"),
      coalesce(col("city"), lit("")).as("city"),
      coalesce(col("asn"), lit(0L)).as("asn"),
      coalesce(col("as_name"), lit("")).as("as_name"),
      lit(source).as("source"),
      col("recordType").as("sourceRecordType"),
      lit(null).cast("timestamp").as("firstSeen"),
      current_timestamp().as("lastSeen"),
      current_timestamp().as("updatedAt"))

    val subdomains = aBase
      .select(
        col("p1"), col("p2"), col("p3"), col("p4"),
        col("p5"), col("p6"), col("p7"),
        lit(source).as("source"),
        col("recordType").as("sourceRecordType"),
        lit(null).cast("timestamp").as("firstSeen"),
        current_timestamp().as("lastSeen"),
        current_timestamp().as("updatedAt"))

    Outputs(rdnsv4, subdomains, cnames)
  }

  /** Subdomain-list variant (App.java:480-533): one column in, one
    * subdomains row out, sourceRecordType = NOT_RESOLVED. */
  def runSubdomainList(lines: DataFrame, tlds: Set[String],
                       source: String): DataFrame = {
    val parsed = lines
      .withColumn("__p", DomainPartsTransform.splitLikeJava(col("value"), ","))
      .filter(size(col("__p")) >= 1)
      .select(element_at(col("__p"), 1).as("raw_domain"))
      .withColumn("domain", cleanCol(lines)(col("raw_domain")))
      .filter(col("domain").isNotNull)
    DomainPartsTransform.withDomainParts(parsed, "domain", tlds)
      .filter(col("dp_success"))
      .filter(length(col("apex")) > 0)
      .select(
        col("p1"), col("p2"), col("p3"), col("p4"),
        col("p5"), col("p6"), col("p7"),
        lit(source).as("source"),
        lit("NOT_RESOLVED").as("sourceRecordType"),
        lit(null).cast("timestamp").as("firstSeen"),
        current_timestamp().as("lastSeen"),
        current_timestamp().as("updatedAt"))
  }
}
