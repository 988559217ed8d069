package graft.tools

import graft.sources.Mmdb

/** Offline mmdb -> CSV exporter: turns a MaxMind City or ASN database
  * into the disjoint range CSV that [[graft.sources.Dims.loadGeo]]
  * broadcasts. Usage: `runMain graft.tools.MmdbExport in.mmdb out.csv`.
  * Run once per database; the reference resolves the same fields per
  * ROW on every worker (App.java:409-420) — the engine resolves per
  * RANGE here, once, then range-joins. */
object MmdbExport {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: MmdbExport <in.mmdb> <out.csv>")
    val db = Mmdb.read(args(0))
    val n = Mmdb.exportCsv(args(0), args(1))
    println(s"[mmdb-export] ${db.metadata.databaseType} " +
      s"(ip_version ${db.metadata.ipVersion}, " +
      s"record_size ${db.metadata.recordSize}): $n ranges -> ${args(1)}")
  }
}
