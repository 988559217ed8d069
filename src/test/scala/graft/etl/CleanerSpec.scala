package graft.etl

import graft.SparkTestBase

/** Cleaner conformance suite (SURVEY §5.4): exact EL/ED/EA routing per
  * mode, expectations hand-derived from the Go rules. */
class CleanerSpec extends SparkTestBase {

  import spark.implicits._

  val tlds: Set[String] = Set("com", "co", "uk", "in", "de", "io", "org")

  private def run(r: Cleaner.CleanResult) = (
    r.valid.collect().map(_.toSeq.map(_.asInstanceOf[String]).mkString(","))
      .sorted.toSeq,
    r.invalid.collect().map(_.getString(0)).sorted.toSeq)

  test("-rdns: strip, repair-and-keep, EL/ED routing") {
    val lines = Seq(
      "93.184.216.34,www.example.com.",     // strip trailing dot
      "198.51.100.1,*.cleanable.example.org", // repaired -> kept (Go)
      "1.2.3.4.,x.com",                     // ip trailing dot stripped too
      "9.9.9.9,123.456",                    // all-numeric -> ED
      "a,b,c",                              // 3 fields -> EL
      "onefield",                           // 1 field -> EL (Go panics)
      "5.6.7.8,abc.."                       // strips ONE dot; 'abc.' valid
    ).toDF("value")
    val (valid, invalid) = run(Cleaner.cleanRdns(lines))
    assert(valid == Seq(
      "1.2.3.4,x.com",
      "198.51.100.1,cleanable.example.org",
      "5.6.7.8,abc.",
      "93.184.216.34,www.example.com").sorted)
    assert(invalid == Seq(
      "ED,9.9.9.9,123.456",
      "EL,a,b,c",
      "EL,onefield").sorted)
  }

  test("-rdns v1: apex consistency EA") {
    val lines = Seq(
      "certstream,example.com,www.example.com.,1717286400",  // ok
      "certstream,example.co.uk,a.b.example.co.uk,1717286400", // l2 apex ok
      "certstream,wrong.com,www.example.com,1717286400",     // EA
      "certstream,456.com,123.456,1717286400",               // ED
      "a,b,c"                                                // EL
    ).toDF("value")
    val (valid, invalid) = run(Cleaner.cleanRdnsV1(lines, tlds))
    assert(valid == Seq(
      "certstream,www.example.com,1717286400",
      "certstream,a.b.example.co.uk,1717286400").sorted)
    assert(invalid == Seq(
      "EA,certstream,wrong.com,www.example.com,1717286400",
      "ED,certstream,456.com,123.456,1717286400",
      "EL,a,b,c").sorted)
  }

  test("-subs: rebuild right-to-left, skip empty and *") {
    val lines = Seq(
      "com,example,www,,,,,1717286400",      // www.example.com
      "uk,co,example,shop,*,,,1717286401",   // shop.example.co.uk
      "com,-bad,,,,,,123",                   // rebuilt '-bad.com' -> ED
      "too,few,fields"                       // EL
    ).toDF("value")
    val (valid, invalid) = run(Cleaner.cleanSubs(lines))
    assert(valid == Seq(
      "www.example.com,1717286400",
      "shop.example.co.uk,1717286401").sorted)
    // ED payload is the REBUILT domain + last_seen (Go quirk)
    assert(invalid == Seq(
      "ED,-bad.com,123",
      "EL,too,few,fields").sorted)
  }

  test("-cname: all three fields validate; no dot stripping") {
    val lines = Seq(
      "real.host.bar.de,bar.de,alias.bar.de",  // ok
      "123.456,bar.de,alias.bar.de",           // target numeric -> ED
      "a.com,b.com",                           // EL
      "t.com,a.com,sub.a.com"                  // ok
    ).toDF("value")
    val (valid, invalid) = run(Cleaner.cleanCname(lines))
    assert(valid == Seq(
      "real.host.bar.de,alias.bar.de",
      "t.com,sub.a.com").sorted)
    assert(invalid == Seq(
      "ED,123.456,bar.de,alias.bar.de",
      "EL,a.com,b.com").sorted)
  }
}
