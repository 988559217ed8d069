package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.GenForAll.forAll
import IpFunctions._

class IpFunctionsSpec extends AnyFunSuite {

  test("ipToLong parses strict dotted quads") {
    assert(ipToLong("1.2.3.4") == Some(16909060L))
    assert(ipToLong("0.0.0.0") == Some(0L))
    assert(ipToLong("255.255.255.255") == Some(4294967295L))
    assert(ipToLong("93.184.216.34") == Some(1572395042L))
  }

  test("ipToLong rejects malformed input") {
    assert(ipToLong(null) == None)
    assert(ipToLong("") == None)
    assert(ipToLong("256.1.1.1") == None)
    assert(ipToLong("1.2.3") == None)
    assert(ipToLong("1.2.3.4.5") == None)
    assert(ipToLong("01.2.3.4") == None)   // leading zero (octal ambiguity)
    assert(ipToLong("1.2.3.x") == None)
    assert(ipToLong("not-an-ip") == None)
    assert(ipToLong("1.2.3.-4") == None)
  }

  test("ipBlock masks match reference /8 /16 /24 semantics") {
    val ip = 16909060L // 1.2.3.4
    assert(longToIp(ipBlock(ip, 8)) == "1.0.0.0")
    assert(longToIp(ipBlock(ip, 16)) == "1.2.0.0")
    assert(longToIp(ipBlock(ip, 24)) == "1.2.3.0")
    assert(longToIp(ipBlock(4294967295L, 24)) == "255.255.255.0")
  }

  test("property: longToIp round-trips through ipToLong") {
    forAll(Gen.choose(0L, 4294967295L)) { v =>
      assert(ipToLong(longToIp(v)) == Some(v))
    }
  }
}
