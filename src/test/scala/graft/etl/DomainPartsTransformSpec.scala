package graft.etl

import graft.SparkTestBase
import graft.functions.DomainFunctions
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import graft.GenForAll.forAll

/** The column-expression domain_parts must agree with the pure Scala
  * semantics on every input — the Scala form is the spec. */
class DomainPartsTransformSpec extends SparkTestBase {

  val tlds: Set[String] =
    Set("com", "co", "uk", "in", "de", "io", "ai", "net", "org")

  private def runBatch(domains: Seq[String]): Seq[DomainFunctions.DomainParts] = {
    import spark.implicits._
    val df = DomainPartsTransform.withDomainParts(
      domains.toDF("domain"), "domain", tlds)
    df.select("domain", "dp_success", "apex",
        "p1", "p2", "p3", "p4", "p5", "p6", "p7")
      .collect()
      .map(r => r.getString(0) -> DomainFunctions.DomainParts(
        r.getBoolean(1), r.getString(2), r.getString(3), r.getString(4),
        r.getString(5), r.getString(6), r.getString(7), r.getString(8),
        r.getString(9)))
      .toMap
      .pipe(m => domains.map(m))
  }

  implicit class Pipe[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }

  test("column transform matches pure semantics on edge corpus") {
    val corpus = Seq(
      "www.example.com", "www.example.com.", "GoOgLe.cOm",
      "shop.example.co.uk", "example.co.in", "co.com", "b.co",
      "a.b.c.d.e.f.g.h.example.com", "e.f.g.h.example.com",
      ".com", "x.y", "wild.example.io", "a.b.c.co.uk",
      "UPPER.CASE.NET", "1.2.3.4", "deep.er.co")
    val got = runBatch(corpus)
    corpus.zip(got).foreach { case (d, g) =>
      val want = DomainFunctions.domainParts(d, tlds)
      // pure form returns "" apex on failure; both agree on success rows
      assert(g == want, s"mismatch for '$d'")
    }
  }

  test("single-label fails in both forms") {
    val got = runBatch(Seq("localhost"))
    assert(!got.head.success)
  }

  test("property: random label lists agree with pure semantics") {
    val label = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaLowerChar, Gen.numChar)).map(_.mkString))
    val domGen = Gen.choose(2, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(label, Gen.oneOf(tlds.toSeq))))
      .map(_.mkString("."))
    val domains = {
      val buf = scala.collection.mutable.ListBuffer.empty[String]
      forAll(domGen, 150)(d => buf += d)
      buf.toList.distinct
    }
    val got = runBatch(domains)
    domains.zip(got).foreach { case (d, g) =>
      assert(g == DomainFunctions.domainParts(d, tlds), s"mismatch for '$d'")
    }
  }
}
