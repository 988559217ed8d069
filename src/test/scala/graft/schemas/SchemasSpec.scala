package graft.schemas

import graft.SparkTestBase
import graft.etl.Migrator
import graft.sources.Dims

/** Migrator outputs must conform to the declared schemas, and the typed
  * record boundary must round-trip them. */
class SchemasSpec extends SparkTestBase {

  import spark.implicits._

  lazy val out = Migrator.run(
    Seq("www.example.com,A,1.2.3.4", "a.b.de,CNAME,t.b.de").toDF("value"),
    Dims.defaultTlds, None, "schema-test")

  private def names(st: org.apache.spark.sql.types.StructType) =
    st.fields.map(f => (f.name, f.dataType.typeName)).toSeq

  test("output column names/types match the declared schemas") {
    assert(names(out.rdnsv4.schema) == names(Schemas.rdnsv4))
    assert(names(out.subdomains.schema) == names(Schemas.subdomains))
    assert(names(out.cnames.schema) == names(Schemas.cnames))
  }

  test("typed record boundary round-trips the outputs") {
    val rdns = out.rdnsv4.as[Schemas.RdnsRecord].collect()
    assert(rdns.length == 1)
    assert(rdns(0).ipAddress == "1.2.3.4" && rdns(0).firstSeen.isEmpty)
    val cn = out.cnames.as[Schemas.CnameRecord].collect()
    assert(cn(0).target == "t.b.de" && cn(0).apexDomain == "t.b.de")
    val sd = out.subdomains.as[Schemas.SubdomainRecord].collect()
    assert(sd(0).p1 == "com" && sd(0).p3 == "example")
  }
}
