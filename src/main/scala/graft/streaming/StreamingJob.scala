package graft.streaming

import graft.GraftSession
import graft.sources.Dims

/** CLI for the checkpointed streaming ingest (T1):
  *
  * {{{
  * runMain graft.streaming.StreamingJob <inputDir> <checkpointDir> <outDir> <source> [tldFile]
  * }}}
  *
  * Processes all currently-available files exactly once (AvailableNow)
  * and exits; re-running after new files arrive processes only the new
  * ones — the cron-batch contract of the reference's daily jobs without
  * the file-moving bookkeeping.
  */
object StreamingJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: StreamingJob <inputDir> <checkpointDir> <outDir> <source> [tldFile]")
    val Array(in, ckpt, out, source) = args.take(4)
    val spark = GraftSession.getOrCreate("graft-streaming")
    val tlds = if (args.length >= 5 && args(4) != "-")
      Dims.loadTlds(spark, args(4)) else Dims.defaultTlds
    val q = StreamingIngest.ingestAvailableNow(
      spark, in, ckpt, out, tlds, None, source)
    q.awaitTermination()
    spark.stop()
  }
}
