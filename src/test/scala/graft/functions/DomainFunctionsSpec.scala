package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.GenForAll.forAll
import DomainFunctions._

/** Behavioral-parity tests for the domain library. Expected values are
  * hand-derived from the reference semantics (cited in the scaladoc of
  * each function), not computed by a port. */
class DomainFunctionsSpec extends AnyFunSuite {

  val tlds: Set[String] =
    Set("com", "co", "uk", "in", "de", "io", "ai", "net", "org")

  // ----- isValidDomain (Go net.isDomainName semantics) -----

  test("isValidDomain accepts RFC-1035-ish names incl. underscore") {
    assert(isValidDomain("example.com"))
    assert(isValidDomain("_dmarc.example.com"))
    assert(isValidDomain("a-b.c-d.net"))
    assert(isValidDomain("x"))
    assert(isValidDomain("a."))        // trailing dot ok
    assert(isValidDomain("123.4a6"))   // one letter suffices
  }

  test("isValidDomain rejections") {
    assert(!isValidDomain(null))
    assert(!isValidDomain(""))
    assert(!isValidDomain("123.456"))      // all-numeric
    assert(!isValidDomain("-a.com"))       // label starts with hyphen
    assert(!isValidDomain("a-.com"))       // label ends with hyphen
    assert(!isValidDomain("a..com"))       // empty label
    assert(!isValidDomain("a.com-"))       // trailing hyphen
    assert(!isValidDomain("a b.com"))      // space
    assert(!isValidDomain("a!b.com"))
    assert(!isValidDomain(("a" * 64) + ".com"))  // label > 63
    assert(isValidDomain(("a" * 63) + ".com"))
  }

  test("isValidDomain length edges: 253/254 with trailing dot") {
    // 253 chars, no trailing dot: valid
    val l63 = "a" * 63
    val d253 = s"$l63.$l63.$l63.${"a" * 61}"
    assert(d253.length == 253 && isValidDomain(d253))
    // 254 chars valid only if last char is '.'
    assert(isValidDomain(d253 + "."))
    val d254 = s"$l63.$l63.$l63.${"a" * 62}"
    assert(d254.length == 254 && !isValidDomain(d254))
    assert(!isValidDomain(d254 + "."))  // 255
  }

  // ----- stripDot (incl. the len<=2 quirk) -----

  test("stripDot") {
    assert(stripDot("example.com.") == "example.com")
    assert(stripDot("ab.") == "ab")
    assert(stripDot("a.") == "a.")   // quirk: len<=2 untouched
    assert(stripDot(".") == ".")
    assert(stripDot("") == "")
    assert(stripDot("abc..") == "abc.")  // only one dot stripped
    assert(stripDot("abc") == "abc")
  }

  // ----- attemptCleanup / validOrRepaired (Go semantics: keep repair) -----

  test("attemptCleanup strips *. and \\\" prefixes") {
    assert(attemptCleanup("*.example.com") == Some("example.com"))
    assert(attemptCleanup("\\\"example.com") == Some("example.com"))
    assert(attemptCleanup("*.123.456") == None)     // repair still invalid
    assert(attemptCleanup("ab") == None)            // too short
    assert(attemptCleanup("plain.com") == None)     // no junk prefix
    assert(validOrRepaired("*.wild.example.io") == Some("wild.example.io"))
    assert(validOrRepaired("good.com") == Some("good.com"))
    assert(validOrRepaired("-bad-") == None)
  }

  // ----- apexDomain (Go: no case folding) -----

  test("apexDomain TLD-aware extraction") {
    assert(apexDomain("www.example.com", tlds) == "example.com")
    assert(apexDomain("shop.books.example.co.uk", tlds) == "example.co.uk")
    assert(apexDomain("example.co.in", tlds) == "example.co.in")
    assert(apexDomain("localhost", tlds) == "localhost")  // single label
    assert(apexDomain("b.co", tlds) == "b.co")
    assert(apexDomain("co.com", tlds) == "co.com")
    // no lowercasing in the Go path: case preserved, l2 lookup misses
    assert(apexDomain("WWW.Example.COM", tlds) == "Example.COM")
  }

  // ----- domainParts (Java observable semantics) -----

  test("domainParts basic 3-label") {
    assert(domainParts("www.example.com", tlds) ==
      DomainParts(true, "example.com", "com", "", "example", "www", "", "", ""))
  }

  test("domainParts lowercases") {
    assert(domainParts("GoOgLe.cOm", tlds) ==
      DomainParts(true, "google.com", "com", "", "google", "", "", "", ""))
  }

  test("domainParts l2-TLD slot layout") {
    assert(domainParts("shop.example.co.uk", tlds) ==
      DomainParts(true, "example.co.uk", "uk", "co", "", "example", "shop", "", ""))
    assert(domainParts("example.co.in", tlds) ==
      DomainParts(true, "example.co.in", "in", "co", "", "example", "", "", ""))
  }

  test("domainParts when the l2 label IS a TLD and is leftmost") {
    // co.com: 'co' in TLD set -> l2TldIndex=0, apex spans whole domain
    assert(domainParts("co.com", tlds) ==
      DomainParts(true, "co.com", "com", "co", "", "", "", "", ""))
  }

  test("domainParts single-label fails") {
    assert(!domainParts("localhost", tlds).success)
    assert(!domainParts("", tlds).success)
  }

  test("domainParts trailing dot dropped by split") {
    assert(domainParts("www.example.com.", tlds) ==
      domainParts("www.example.com", tlds))
  }

  test("domainParts deep domain truncation (>=7 labels drops deepest)") {
    // 10 labels: p7 = labels(n-6); a.b.c.d overflow is observably dropped
    assert(domainParts("a.b.c.d.e.f.g.h.example.com", tlds) ==
      DomainParts(true, "example.com", "com", "", "example", "h", "g", "f", "e"))
  }

  test("domainParts 6 labels exactly fills the slots") {
    assert(domainParts("e.f.g.h.example.com", tlds) ==
      DomainParts(true, "example.com", "com", "", "example", "h", "g", "f", "e"))
  }

  test("domainParts empty leading label") {
    assert(domainParts(".com", tlds) ==
      DomainParts(true, ".com", "com", "", "", "", "", "", ""))
  }

  // property: round-trip reassembly — non-empty parts joined deepest-first
  // rebuild a suffix of the lowercased domain (X11 semantics)
  test("property: parts rebuild a suffix of the domain") {
    val label = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val domGen = Gen.choose(2, 9).flatMap(n => Gen.listOfN(n, label))
    forAll(domGen) { labels =>
      val domain = labels.mkString(".")
      val dp = domainParts(domain, tlds)
      assert(dp.success)
      val rebuilt = Seq(dp.p7, dp.p6, dp.p5, dp.p4, dp.p3, dp.p2, dp.p1)
        .filter(_.nonEmpty).mkString(".")
      assert(domain.endsWith(rebuilt))
      // p1 is always the TLD label; apex ends with it
      assert(dp.p1 == labels.last)
      assert(dp.apex.endsWith(dp.p1))
      // exactly one of p2/p3 may be non-empty at the pair slots
      assert(dp.p2.isEmpty || dp.p3.isEmpty)
    }
  }

  test("property: apexDomain is consistent with domainParts apex on lowercase") {
    val label = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val domGen = Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, label))
    forAll(domGen) { labels =>
      val domain = labels.mkString(".")
      assert(domainParts(domain, tlds).apex == apexDomain(domain, tlds))
    }
  }

  // ----- reverseSurt -----

  test("reverseSurt") {
    assert(reverseSurt("com,example,www") == "www.example.com")
    assert(reverseSurt("de,bar") == "bar.de")
    assert(reverseSurt("single") == "single")
    assert(reverseSurt("a,,b") == "b..a")  // empty component preserved
  }
}
