package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** IPv4 helpers (reference App.java:673-699 `getIPBlock`, App.java:396
  * `InetAddress.getByName` parse).
  *
  * Engine convention (SURVEY §1.2): an address is carried as BOTH a
  * canonical dotted-quad string and a `LongType` `ip_int` so that range
  * joins and ordering are numeric (Cassandra INET byte order == numeric
  * order for v4). IPv4-only by design — the reference's bit math crashes
  * on v6 (App.java:678); we return null instead.
  *
  * Divergence (documented): the reference parses via
  * `InetAddress.getByName`, which falls back to DNS resolution for
  * non-literal strings. A data engine must not do network I/O per row, so
  * we accept strict dotted-quad literals only.
  *
  * All column forms are pure built-in expressions — fully codegen'd, no
  * UDFs in the hot path.
  */
object IpFunctions {

  private val dottedQuad =
    "^(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)$"

  /** Strict dotted-quad parse. */
  def ipToLong(s: String): Option[Long] = {
    if (s == null) return None
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return None
    var acc = 0L
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return None
      val v = p.toInt
      if (v > 255 || (p.length > 1 && p.charAt(0) == '0')) return None
      acc = acc * 256 + v
      i += 1
    }
    Some(acc)
  }

  def longToIp(v: Long): String =
    s"${(v >> 24) & 0xFF}.${(v >> 16) & 0xFF}.${(v >> 8) & 0xFF}.${v & 0xFF}"

  /** Network address of the /n block, as a long (App.java:673-699). */
  def ipBlock(ipInt: Long, prefixLength: Int): Long =
    ipInt & ((0xFFFFFFFFL << (32 - prefixLength)) & 0xFFFFFFFFL)

  // ---- column forms (codegen; null on malformed input) ----

  /** dotted-quad string -> long, null if not a strict IPv4 literal. */
  def ipToLongCol(ip: Column): Column = {
    val p = split(ip, "\\.")
    when(ip.rlike(dottedQuad),
      element_at(p, 1).cast("long") * 16777216L +
        element_at(p, 2).cast("long") * 65536L +
        element_at(p, 3).cast("long") * 256L +
        element_at(p, 4).cast("long"))
  }

  /** long -> dotted-quad string. */
  def longToIpCol(v: Column): Column =
    concat_ws(".",
      shiftright(v, 24).bitwiseAND(255).cast("string"),
      shiftright(v, 16).bitwiseAND(255).cast("string"),
      shiftright(v, 8).bitwiseAND(255).cast("string"),
      v.bitwiseAND(255).cast("string"))

  /** /n network address of an ip_int column. */
  def ipBlockCol(ipInt: Column, prefixLength: Int): Column = {
    val mask = (0xFFFFFFFFL << (32 - prefixLength)) & 0xFFFFFFFFL
    ipInt.bitwiseAND(lit(mask))
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("ip_to_long", (s: String) =>
      ipToLong(s).map(java.lang.Long.valueOf).orNull)
    spark.udf.register("long_to_ip", (v: java.lang.Long) =>
      if (v == null) null else longToIp(v))
    spark.udf.register("ip_block", (v: java.lang.Long, n: Int) =>
      if (v == null) null else java.lang.Long.valueOf(ipBlock(v, n)))
  }
}
