package graft.etl

import graft.GraftSession
import graft.sources.Dims

/** CLI mirroring the reference cleaner binary's flag dispatch
  * (utils/cleaner/main.go:8-28), files replacing stdin/stdout/stderr:
  *
  * {{{
  * runMain graft.etl.CleanerJob -rdns|-rdns-v1|-subs|-cname \
  *   <inputGlob> <validOutDir> <invalidOutDir> [tldFile]
  * }}}
  *
  * Valid rows are written as CSV in the mode's output schema; invalid
  * rows as the `E?,<payload>`-prefixed text lines the reference emits
  * on stderr.
  */
object CleanerJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: CleanerJob -rdns|-rdns-v1|-subs|-cname <inputGlob> <validOut> <invalidOut> [tldFile]")
    val Array(mode, input, validOut, invalidOut) = args.take(4)
    val spark = GraftSession.getOrCreate("graft-cleaner")
    val tlds = if (args.length >= 5 && args(4) != "-")
      Dims.loadTlds(spark, args(4)) else Dims.defaultTlds

    val lines = spark.read.text(input)
    val result = mode match {
      case "-rdns"    => Cleaner.cleanRdns(lines)
      case "-rdns-v1" => Cleaner.cleanRdnsV1(lines, tlds)
      case "-subs"    => Cleaner.cleanSubs(lines)
      case "-cname"   => Cleaner.cleanCname(lines)
      case other => sys.error(
        s"unknown mode '$other' (-rdns | -rdns-v1 | -subs | -cname)")
    }
    result.valid.write.mode("overwrite")
      .option("emptyValue", "").csv(validOut)
    result.invalid.write.mode("overwrite").text(invalidOut)
    spark.stop()
  }
}
