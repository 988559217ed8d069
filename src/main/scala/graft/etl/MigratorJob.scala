package graft.etl

import graft.GraftSession
import graft.sources.{Dims, OrderedSink}

/** CLI mirroring the reference's `App.main(FileType, DataSource)` contract
  * (App.java:58-109):
  *
  * {{{
  * runMain graft.etl.MigratorJob CSV      <inputGlob> <outDir> <source> [tldFile] [geoCsv] [stagingDir]
  * runMain graft.etl.MigratorJob CSV_SUBD <inputGlob> <outDir> <source> [tldFile]
  * }}}
  *
  * With `stagingDir` the parsed intermediate is materialized as a
  * parquet staging table instead of executor cache — the 100 TB
  * configuration (fits any size, survives executor loss).
  *
  * CSV mode writes rdnsv4/ subdomains/ cnames/ under outDir in the
  * reference's (partition, clustering) layout; CSV_SUBD writes
  * subdomains/ only. Input files are plain or .gz text (S1/S6 — the gz
  * codec is native to the text source).
  */
object MigratorJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: MigratorJob CSV|CSV_SUBD <inputGlob> <outDir> <source> [tldFile] [geoCsv]")
    val Array(fileType, input, outDir, source) = args.take(4)
    val spark = GraftSession.getOrCreate("graft-migrator")

    // "-" (or omission) selects the built-in default for either dim
    def opt(i: Int): Option[String] =
      if (args.length > i && args(i).nonEmpty && args(i) != "-") Some(args(i))
      else None
    val tlds = opt(4).map(Dims.loadTlds(spark, _)).getOrElse(Dims.defaultTlds)
    val geo = opt(5).map(Dims.loadGeo(spark, _))

    val lines = spark.read.text(input)

    fileType match {
      case "CSV" =>
        val out = opt(6) match {
          case Some(staging) =>
            Migrator.runStaged(lines, tlds, geo, source, staging)
          case None =>
            Migrator.run(lines, tlds, geo, source, cacheParsed = true)
        }
        OrderedSink.writeRdnsv4(out.rdnsv4, s"$outDir/rdnsv4")
        OrderedSink.writeSubdomains(out.subdomains, s"$outDir/subdomains")
        OrderedSink.writeCnames(out.cnames, s"$outDir/cnames")
      case "CSV_SUBD" =>
        val subs = Migrator.runSubdomainList(lines, tlds, source)
        OrderedSink.writeSubdomains(subs, s"$outDir/subdomains")
      case other =>
        sys.error(s"unknown FileType '$other' (CSV | CSV_SUBD)")
    }
    spark.stop()
  }
}
