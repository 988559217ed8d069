package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The codegen-friendly Column forms must agree with the pure Scala forms
  * — the column forms run in the hot path, the Scala forms define the
  * semantics. */
class ColumnFunctionsSpec extends SparkTestBase {

  lazy val ips: Seq[String] = Seq(
    "1.2.3.4", "0.0.0.0", "255.255.255.255", "93.184.216.34",
    "256.1.1.1", "01.2.3.4", "1.2.3", "", "not-an-ip", "1.2.3.4.5",
    "10.0.0.1", "199.9.9.9", "25.55.255.0")

  test("ipToLongCol matches ipToLong incl. rejections") {
    import spark.implicits._
    val got = ips.toDF("ip")
      .select(IpFunctions.ipToLongCol(col("ip")).as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq == ips.map(IpFunctions.ipToLong))
  }

  test("longToIpCol + ipBlockCol match scala forms") {
    import spark.implicits._
    val vs = Seq(0L, 16909060L, 4294967295L, 1572395042L, 3232235777L)
    val rows = vs.toDF("v").select(
      IpFunctions.longToIpCol(col("v")).as("ip"),
      IpFunctions.longToIpCol(IpFunctions.ipBlockCol(col("v"), 24)).as("ip24"))
      .collect()
    rows.zip(vs).foreach { case (r, v) =>
      assert(r.getString(0) == IpFunctions.longToIp(v))
      assert(r.getString(1) == IpFunctions.longToIp(IpFunctions.ipBlock(v, 24)))
    }
  }

  test("stripDotCol matches stripDot quirk semantics") {
    import spark.implicits._
    val ds = Seq("example.com.", "ab.", "a.", ".", "", "abc..", "abc")
    val got = ds.toDF("d")
      .select(DomainFunctions.stripDotCol(col("d")).as("s"))
      .collect().map(_.getString(0))
    assert(got.toSeq == ds.map(DomainFunctions.stripDot))
  }

  test("reverseSurtCol matches reverseSurt") {
    import spark.implicits._
    val ss = Seq("com,example,www", "de,bar", "single", "a,,b")
    val got = ss.toDF("s")
      .select(DomainFunctions.reverseSurtCol(col("s")).as("r"))
      .collect().map(_.getString(0))
    assert(got.toSeq == ss.map(DomainFunctions.reverseSurt))
  }

  test("apexNaive takes last two labels") {
    import spark.implicits._
    val got = Seq("www.example.com", "a.b.c.d", "x.y")
      .toDF("d").select(DomainFunctions.apexNaive(col("d")).as("a"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("example.com", "c.d", "x.y"))
  }

  test("surtHost cuts before ')' and stripWildcard strips prefix") {
    import spark.implicits._
    val got = Seq("com,example,www)/path 2024", "de,bar)/")
      .toDF("l").select(
        DomainFunctions.reverseSurtCol(DomainFunctions.surtHost(col("l"))).as("d"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("www.example.com", "bar.de"))

    val w = Seq("*.wild.example.io", "plain.com", "a.*.b")
      .toDF("d").select(DomainFunctions.stripWildcard(col("d")).as("s"))
      .collect().map(_.getString(0))
    assert(w.toSeq == Seq("wild.example.io", "plain.com", "a.*.b"))
  }

  test("registered UDFs work in SQL") {
    DomainFunctions.register(spark, Set("com", "co", "uk"))
    IpFunctions.register(spark)
    val r = spark.sql(
      """SELECT is_valid_domain('a.com') v, apex_domain('x.y.example.co.uk') a,
        |       clean_domain('*.ok.com') c, ip_to_long('1.2.3.4') i,
        |       domain_parts('www.example.com').p3 p3""".stripMargin)
      .collect()(0)
    assert(r.getBoolean(0))
    assert(r.getString(1) == "example.co.uk")
    assert(r.getString(2) == "ok.com")
    assert(r.getLong(3) == 16909060L)
    assert(r.getString(4) == "example")
  }
}
