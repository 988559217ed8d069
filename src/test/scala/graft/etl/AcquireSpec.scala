package graft.etl

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AcquireSpec extends SparkTestBase {

  import spark.implicits._

  test("cdx conversion: SURT cut + reverse (X6/X7)") {
    val got = Acquire.convertCcIndex(
        Seq("com,example,www)/path 20240601000000 {}",
          "de,bar)/ 20240601").toDF("value"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("www.example.com", "bar.de"))
  }

  test("blocklist anti-filter (F7) with reference-style patterns") {
    val patterns = Seq(".*\\.amazonaws.com$", ".*\\.herokuapp.com$",
      "^[0-9]{1,}\\.[a-z]{1,}$")
    val got = Acquire.applyBlocklist(
        Seq("x.y.amazonaws.com", "app.herokuapp.com", "keep.example.com",
          "123.abc", "ok123.abc").toDF("domain"), patterns)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("keep.example.com", "ok123.abc"))
  }

  test("TLD allowlist (F8), wildcard strip (F9), blank drop (F10)") {
    val df = Seq("a.gov", "b.ru", "keep.io", "drop.biz", "*.w.io", "  ")
      .toDF("domain")
    val got = Acquire.tldAllowlist(
        Acquire.stripWildcards(Acquire.dropBlank(df)),
        Seq(".gov", ".ru", ".io"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a.gov", "b.ru", "keep.io", "w.io"))
  }

  test("history dedup is one anti-join over unioned days (J3/E1/E2)") {
    val today = Seq("new.com", "old1.com", "old25.com").toDF("domain")
    val days = Seq(
      Seq("old1.com").toDF("domain"),
      Seq("old25.com", "gone.com").toDF("domain"))
    val got = Acquire.dedupAgainstHistory(today, Acquire.unionDays(days))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("new.com"))
  }

  test("massdns output to CSV (X8)") {
    val got = Acquire.massdnsToCsv(
        Seq("www.example.com. A 1.2.3.4").toDF("value"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("www.example.com.,A,1.2.3.4"))
  }
}
