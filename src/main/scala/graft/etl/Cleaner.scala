package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.DomainFunctions

/** The reference's stdin cleaner (utils/cleaner/) as one-pass DataFrame
  * transforms: each mode tags rows with an error code (EL = arity,
  * ED = domain, EA = apex mismatch) and splits valid/invalid — the K3
  * split-sink shape (utils/cleaner/utils.go:95-109).
  *
  * Spark-first notes:
  *  - the Go pipeline's 500-worker unordered fan-out is exactly Spark's
  *    task model; output order is not part of the contract.
  *  - validation is one projection over the line; the only UDFs are the
  *    domain validator and TLD-aware apex (broadcast-captured TLD set) —
  *    everything else is built-in expressions.
  *
  * Documented divergence: lines with fewer fields than the Go code
  *  indexes before its own arity check (e.g. a 1-field line in `-rdns`)
  *  crash the Go process with an index panic; here they are routed to EL.
  */
object Cleaner {

  /** valid rows in the mode's output schema; invalid rows as the
    * stderr-format string `E?,<payload>`. */
  final case class CleanResult(valid: DataFrame, invalid: DataFrame)

  import DomainFunctions.stripDotCol

  /** Validator as the codegen'd native expression (no UDF in the hot
    * path); the expression itself is non-nullable (NULL -> false), so
    * negation-safe without a coalesce guard. */
  private def validCol(lines: DataFrame)(c: Column): Column = {
    graft.plans.GraftExtensions.install(lines.sparkSession)
    call_function("is_valid_domain_native", c)
  }

  /** Column form of validOrRepaired (F2+F3, Go keep-repaired
    * semantics): valid -> unchanged; `*.`/`\"`-prefixed with a valid
    * remainder -> repaired; else null. One codegen'd native call
    * ([[graft.plans.ValidOrRepairedExpr]], delegating to the pure
    * function) — the when-chain form inlined the validator three times
    * plus substring branches into the generated code. */
  def validOrRepairedCol(lines: DataFrame)(c: Column): Column = {
    graft.plans.GraftExtensions.install(lines.sparkSession)
    call_function("valid_or_repaired_native", c)
  }
  private def split0(c: Column): Column = split(c, ",", -1)

  /** `-rdns` (2-col `ip,domain`, clean_rdns.go:43-71). Trailing dots
    * stripped from both fields; domain repaired if possible (Go keeps
    * repairs). Valid output: (ip, domain). */
  def cleanRdns(lines: DataFrame): CleanResult = {
    val parts = split0(col("value"))
    val tagged = lines
      .withColumn("__p", parts)
      .withColumn("__ip", stripDotCol(element_at(col("__p"), 1)))
      .withColumn("__dom",
        when(size(col("__p")) >= 2, stripDotCol(element_at(col("__p"), 2))))
      .withColumn("__cleaned", validOrRepairedCol(lines)(col("__dom")))
      .withColumn("err_code",
        when(size(col("__p")) =!= 2, "EL")
          .when(col("__cleaned").isNull, "ED"))
    CleanResult(
      valid = tagged.filter(col("err_code").isNull)
        .select(col("__ip").as("ip"), col("__cleaned").as("domain")),
      invalid = tagged.filter(col("err_code").isNotNull)
        .select(concat_ws(",", col("err_code"), col("value")).as("value")))
  }

  /** rdns v1 (4-col `source,apex,domain,ts`, clean_rdns.go:9-41): strips
    * apex+domain, re-derives the apex and rejects mismatches (EA). No
    * repair in this mode. Valid output: (source, domain, ts). */
  def cleanRdnsV1(lines: DataFrame, tlds: Set[String]): CleanResult = {
    val valid = validCol(lines) _
    val parts = split0(col("value"))
    // the re-derived apex for the EA check comes from the broadcast-join
    // column form (DomainPartsTransform.withTldAwareApex) — the cleaner
    // is a throughput path; no ScalaUDF in any mode's plan (PlanSpec)
    val tagged = DomainPartsTransform.withTldAwareApex(
      lines
        .withColumn("__p", parts)
        .withColumn("__apex",
          when(size(col("__p")) >= 2, stripDotCol(element_at(col("__p"), 2))))
        .withColumn("__dom",
          when(size(col("__p")) >= 3, stripDotCol(element_at(col("__p"), 3)))),
      "__dom", tlds, "__rederived")
      .withColumn("err_code",
        when(size(col("__p")) =!= 4, "EL")
          .when(!valid(col("__dom")), "ED")
          .when(stripDotCol(col("__rederived")) =!= col("__apex"), "EA"))
    CleanResult(
      valid = tagged.filter(col("err_code").isNull)
        .select(
          element_at(col("__p"), 1).as("source"),
          col("__dom").as("domain"),
          element_at(col("__p"), 4).as("ts")),
      invalid = tagged.filter(col("err_code").isNotNull)
        .select(concat_ws(",", col("err_code"), col("value")).as("value")))
  }

  /** `-subs` (8-col reversed parts, clean_subdomains.go:9-43): rebuild
    * the domain right-to-left skipping empty and `*` parts (X11), then
    * validate. Valid output: (domain, last_seen); ED payload is the
    * REBUILT domain + last_seen, not the input line (Go quirk kept). */
  def cleanSubs(lines: DataFrame): CleanResult = {
    val valid = validCol(lines) _
    val parts = split0(col("value"))
    // reference strips each part before the skip test
    val stripped = transform(slice(col("__p"), 1, 7),
      p => DomainFunctions.stripDotCol(p))
    val tagged = lines
      .withColumn("__p", parts)
      .withColumn("__dom",
        when(size(col("__p")) === 8,
          concat_ws(".", reverse(filter(stripped,
            p => p =!= "" && p =!= "*")))))
      .withColumn("__last_seen",
        when(size(col("__p")) === 8, element_at(col("__p"), 8)))
      .withColumn("err_code",
        when(size(col("__p")) =!= 8, "EL")
          .when(!valid(col("__dom")), "ED"))
    CleanResult(
      valid = tagged.filter(col("err_code").isNull)
        .select(col("__dom").as("domain"), col("__last_seen").as("last_seen")),
      invalid = tagged.filter(col("err_code").isNotNull)
        .select(
          when(col("err_code") === "EL",
            concat_ws(",", col("err_code"), col("value")))
            .otherwise(concat_ws(",", col("err_code"), col("__dom"),
              col("__last_seen"))).as("value")))
  }

  /** `-cname` (3-col `target,apex,domain`, clean_cname.go:9-31): all
    * three fields must validate (no dot-stripping in this mode). Valid
    * output: (target, domain). */
  def cleanCname(lines: DataFrame): CleanResult = {
    val valid = validCol(lines) _
    val parts = split0(col("value"))
    val tagged = lines
      .withColumn("__p", parts)
      .withColumn("err_code",
        when(size(col("__p")) =!= 3, "EL")
          .when(!(valid(element_at(col("__p"), 1)) &&
                  valid(element_at(col("__p"), 2)) &&
                  valid(element_at(col("__p"), 3))), "ED"))
    CleanResult(
      valid = tagged.filter(col("err_code").isNull)
        .select(
          element_at(col("__p"), 1).as("target"),
          element_at(col("__p"), 3).as("domain")),
      invalid = tagged.filter(col("err_code").isNotNull)
        .select(concat_ws(",", col("err_code"), col("value")).as("value")))
  }
}
