package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.DomainFunctions

/** The acquisition-side transforms (SURVEY §7.1 module 6): Common Crawl
  * cdx conversion, certstream filters, history dedup, unions. The
  * download step itself (wget) stays outside the engine — inputs are
  * files/tables.
  */
object Acquire {

  /** X7+X6: cdx line -> host domain
    * (`com,example,www)/path ...` -> `www.example.com`). */
  def convertCcIndex(lines: DataFrame, colName: String = "value"): DataFrame =
    lines.select(DomainFunctions.reverseSurtCol(
      DomainFunctions.surtHost(col(colName))).as("domain"))

  /** F10: drop blank lines. */
  def dropBlank(df: DataFrame, c: String = "domain"): DataFrame =
    df.filter(length(trim(col(c))) > 0)

  /** F9: strip a leading wildcard. */
  def stripWildcards(df: DataFrame, c: String = "domain"): DataFrame =
    df.withColumn(c, DomainFunctions.stripWildcard(col(c)))

  /** F7: regex blocklist as an anti-filter. Patterns are OR-combined
    * into one compiled regex — one codegen'd rlike per row, the Spark
    * analog of `grep -vEf unwanted-domains`. */
  def applyBlocklist(df: DataFrame, patterns: Seq[String],
                     c: String = "domain"): DataFrame =
    if (patterns.isEmpty) df
    else df.filter(!col(c).rlike(patterns.mkString("(?:", ")|(?:", ")")))

  /** F8: TLD allowlist (`grep -E` keep-list of suffixes). An EMPTY
    * allowlist allows nothing (keep-none), mirroring grep -E with no
    * matching pattern — not a crash. */
  def tldAllowlist(df: DataFrame, suffixes: Seq[String],
                   c: String = "domain"): DataFrame =
    if (suffixes.isEmpty) df.filter(lit(false))
    else df.filter(suffixes.map(sfx => col(c).endsWith(sfx))
      .reduce((a, b) => a || b))

  /** X8: massdns space-separated output -> CSV. */
  def massdnsToCsv(lines: DataFrame, colName: String = "value"): DataFrame =
    lines.select(translate(col(colName), " ", ",").as("value"))

  /** J3/T2 batch form: today's domains minus anything in the history
    * union. ONE anti-join against the unioned history (1 shuffle)
    * rather than 25 per-day EXCEPTs — semantically identical to the
    * `comm -23` loop, and the history side prunes by date partition. */
  def dedupAgainstHistory(today: DataFrame, history: DataFrame,
                          c: String = "domain"): DataFrame =
    today.join(history.select(c), Seq(c), "left_anti")

  /** E2: union-all of daily files (`cat b >> domains`). */
  def unionDays(days: Seq[DataFrame]): DataFrame = {
    require(days.nonEmpty, "unionDays needs at least one day frame")
    days.reduce((a, b) => a.unionByName(b))
  }
}
