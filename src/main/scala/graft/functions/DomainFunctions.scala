package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Domain-string function library.
  *
  * Pure Scala ports of the reference's signature transforms (behavioral
  * parity, re-implemented from observed semantics — not translated):
  *
  *  - `isValidDomain`  — RFC-1035-ish validator; semantics of the Go port of
  *    `net.isDomainName` (reference `utils/cleaner/utils.go:13-65`): max 253
  *    chars (254 with trailing dot), labels 1..63, `[A-Za-z0-9_-]`, no label
  *    starting at a `-`-after-`.`, must contain at least one non-numeric
  *    char. The engine standardizes on these Go semantics everywhere (the
  *    reference's Java path used commons `DomainValidator` — a TLD-aware
  *    allowlist — but the Go port is the documented, self-contained rule
  *    set; divergence noted in SURVEY §7.4).
  *  - `stripDot`       — drop one trailing dot, except on strings of
  *    length <= 2 (quirk of `utils/cleaner/utils.go:67-74`, kept).
  *  - `attemptCleanup` — strip leading `\"` or `*.` then revalidate
  *    (`utils/cleaner/utils.go:207-220`). Go semantics: a successful repair
  *    KEEPS the record (the Java path at `App.java:355-365` drops even
  *    repaired domains — we adopt the Go behavior, see SURVEY §7.4).
  *  - `apexDomain`     — TLD-aware apex extraction, NO case folding
  *    (`utils/cleaner/utils.go:178-205`).
  *  - `domainParts`    — lowercase + reversed-label decomposition into
  *    (apex, p1..p7) exactly as consumed by the reference's writers
  *    (`App.java:744-825` produced, `App.java:442-477` consumed). Note the
  *    observable quirk: for domains with >= 7 labels the overflow join of
  *    the deepest labels is appended at an index the consumers never read,
  *    so observably p7 = labels(n-6) and deeper labels are dropped.
  *  - `reverseSurt`    — Common Crawl SURT host `com,example,www` ->
  *    `www.example.com` (`utils/cc_download_convert/convert.go:10-27`).
  *
  * Each has (a) a pure Scala form (property-tested), (b) a registered UDF
  * for ad-hoc SQL, and (c) where hot-path-relevant, a codegen-friendly
  * Column-expression form in [[DomainTransforms]] that avoids UDF overhead.
  */
object DomainFunctions {

  /** Go `net.isDomainName` semantics (utils/cleaner/utils.go:13-65). */
  def isValidDomain(s: String): Boolean = {
    if (s == null) return false
    val l = s.length
    if (l == 0 || l > 254 || (l == 254 && s.charAt(l - 1) != '.')) return false
    var last: Char = '.'
    var nonNumeric = false
    var partlen = 0
    var i = 0
    while (i < l) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_') {
        nonNumeric = true; partlen += 1
      } else if (c >= '0' && c <= '9') {
        partlen += 1
      } else if (c == '-') {
        if (last == '.') return false
        nonNumeric = true; partlen += 1
      } else if (c == '.') {
        if (last == '.' || last == '-') return false
        if (partlen > 63 || partlen == 0) return false
        partlen = 0
      } else {
        return false
      }
      last = c
      i += 1
    }
    if (last == '-' || partlen > 63) return false
    nonNumeric
  }

  /** utils/cleaner/utils.go:67-74 — including the len<=2 no-op quirk. */
  def stripDot(s: String): String = {
    if (s == null) return null
    val dlen = s.length - 1
    if (dlen - 1 <= 0 || !s.endsWith(".")) s else s.substring(0, dlen)
  }

  /** Go AttemptDomainCleanUp (utils/cleaner/utils.go:207-220):
    * Some(cleaned) on successful repair, None otherwise. */
  def attemptCleanup(domain: String): Option[String] = {
    if (domain == null || domain.length <= 2) return None
    val head = domain.substring(0, 2)
    if (head == "\\\"" || head == "*.") {
      val cleaned = domain.substring(2)
      if (isValidDomain(cleaned)) Some(cleaned) else None
    } else None
  }

  /** Valid-or-repaired domain (Go cleaner composite rule): the value the
    * pipeline keeps, or None if the row is to be rejected. */
  def validOrRepaired(domain: String): Option[String] =
    if (isValidDomain(domain)) Some(domain) else attemptCleanup(domain)

  /** TLD-aware apex, Go semantics (utils/cleaner/utils.go:178-205).
    * No lowercasing; single-label input returned unchanged. */
  def apexDomain(domain: String, tlds: Set[String]): String = {
    if (domain == null) return null
    val parts = domain.split("\\.")
    val tldIndex = parts.length - 1
    if (tldIndex <= 0) return domain
    val l2TldIndex = if (tlds.contains(parts(tldIndex - 1))) tldIndex - 1 else tldIndex
    val labelIndex = math.max(l2TldIndex - 1, 0)
    parts.slice(labelIndex, tldIndex + 1).mkString(".")
  }

  /** Result of [[domainParts]]; p1=tld, p2=l2tld|"", p3=""|adjacent label,
    * p4..p7 = successively deeper labels (see class doc for >=7-label
    * truncation). `success=false` for single-label input — all other
    * fields empty then. */
  final case class DomainParts(
      success: Boolean, apex: String,
      p1: String, p2: String, p3: String, p4: String,
      p5: String, p6: String, p7: String)

  private val failedParts = DomainParts(false, "", "", "", "", "", "", "", "")

  /** Java getDomainParts observable semantics (App.java:744-825 as consumed
    * by App.java:442-477). Lowercases input. */
  def domainParts(domainRaw: String, tlds: Set[String]): DomainParts = {
    if (domainRaw == null) return failedParts
    val domain = domainRaw.toLowerCase
    val parts = domain.split("\\.")
    val tldIndex = parts.length - 1
    if (tldIndex <= 0) return failedParts

    val l2TldIndex = if (tlds.contains(parts(tldIndex - 1))) tldIndex - 1 else tldIndex
    val labelIndex = math.max(l2TldIndex - 1, 0)
    val apex = parts.slice(labelIndex, tldIndex + 1).mkString(".")

    val slots = scala.collection.mutable.ArrayBuffer.empty[String]
    slots += parts(tldIndex)
    if (l2TldIndex != tldIndex) { slots += parts(l2TldIndex); slots += "" }
    else { slots += ""; slots += parts(tldIndex - 1) }
    val lastPartIndex = math.max(tldIndex - 5, 0)
    var i = tldIndex - 2
    while (i >= lastPartIndex) { slots += parts(i); i -= 1 }
    // The reference appends an 8th overflow slot here (App.java:812-817)
    // that its consumers never read; we emit only the 7 observable slots.
    while (slots.length < 7) slots += ""
    DomainParts(true, apex,
      slots(0), slots(1), slots(2), slots(3), slots(4), slots(5), slots(6))
  }

  /** SURT-form host to domain: `com,example,www` -> `www.example.com`
    * (utils/cc_download_convert/convert.go:10-27). */
  def reverseSurt(input: String): String = {
    if (input == null) return null
    input.split(",", -1).reverse.mkString(".")
  }

  // ---------------------------------------------------------------------
  // Column-expression forms (codegen-friendly; no UDF, no broadcast state)
  // ---------------------------------------------------------------------

  /** Naive 2-label apex (the ClickHouse approximation,
    * misc/clickhouse_queries.md:24). */
  def apexNaive(domain: Column): Column =
    concat_ws(".", slice(split(domain, "\\."), -2, 2))

  /** Last label (misc/clickhouse_queries.md:31). */
  def tldOf(domain: Column): Column =
    element_at(split(domain, "\\."), -1)

  /** SURT reverse as columns (X6). */
  def reverseSurtCol(c: Column): Column =
    concat_ws(".", reverse(split(c, ",", -1)))

  /** SURT prefix cut: text before the first `)` (X7). */
  def surtHost(c: Column): Column = substring_index(c, ")", 1)

  /** Strip a single leading `*.` (F9). */
  def stripWildcard(c: Column): Column = regexp_replace(c, "^\\*\\.", "")

  /** Strip one trailing dot — column form of [[stripDot]] incl. quirk. */
  def stripDotCol(c: Column): Column =
    when(length(c) <= 2, c).otherwise(regexp_replace(c, "\\.$", ""))

  // ---------------------------------------------------------------------
  // UDF registration for spark.sql use
  // ---------------------------------------------------------------------

  /** Register all domain UDFs on a session. `tlds` is captured in the
    * closure — Spark ships it once per executor via task broadcast. */
  def register(spark: SparkSession, tlds: Set[String]): Unit = {
    spark.udf.register("is_valid_domain", (s: String) => isValidDomain(s))
    spark.udf.register("strip_dot", (s: String) => stripDot(s))
    spark.udf.register("clean_domain", (s: String) => validOrRepaired(s).orNull)
    spark.udf.register("apex_domain", (s: String) => apexDomain(s, tlds))
    spark.udf.register("domain_parts", (s: String) => domainParts(s, tlds))
    spark.udf.register("reverse_surt", (s: String) => reverseSurt(s))
  }
}
