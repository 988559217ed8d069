package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {

  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextAnalysis.redactPii(col("t")))
      .collect()(0).getString(0)

  test("redactPii scrubs emails, phones, and IPv4 literals") {
    assert(redact("mail a.b+tag@sub.example.co.uk now") == "mail <EMAIL> now")
    assert(redact("call +44-123-4567 or +1-555-0000") ==
      "call <PHONE> or <PHONE>")
    assert(redact("host 192.168.0.1 and 10.0.255.7") ==
      "host <IP> and <IP>")
    assert(redact("a@b.com at 1.2.3.4 via +1-555-1234") ==
      "<EMAIL> at <IP> via <PHONE>")
    // no PII -> text unchanged (no accidental matches on word salad)
    val salad = "key agg row scan slow fast table value part hash"
    assert(redact(salad) == salad)
  }

  test("piiCounts reports per-kind match counts on the original text") {
    val r = Seq("a@b.com c@d.org at 1.2.3.4 via +1-555-1234").toDF("t")
      .select(TextAnalysis.piiCounts(col("t")).as("c"))
      .select("c.n_emails", "c.n_phones", "c.n_ips").collect()(0)
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 1, 1)))
  }
}
