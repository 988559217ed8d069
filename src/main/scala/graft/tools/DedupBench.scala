package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Dedup

/** Scale-curve harness for the MinHash dedup family: replicates the
  * sf0.1 documents corpus K times with a per-replica token prefix
  * (replicas cannot cross-match, so TRUE pair count scales linearly —
  * any superlinear growth in candidates or wall time is an operator
  * problem, not a data artifact) and measures the full near-dup
  * ladder plus clustering at each K.
  *
  * {{{ sbt "runMain graft.tools.DedupBench [sfDir] [K1,K2,...]" }}}
  *
  * This is a MEASUREMENT harness over synthesized replicas (the
  * EtlBench pattern), not an oracle input — correctness for these
  * operators is gated by q_dedup_* / q_contaminate_neardup on the
  * driver's parquet.
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.drop(1).headOption.getOrElse("1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.getOrCreate("graft-dedup-bench")
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")

    def corpus(k: Int): DataFrame =
      if (k == 1) base
      else base.crossJoin(
          spark.range(k).select(col("id").as("replica")))
        .select(
          (col("doc_id") + col("replica") * 10000000L).as("doc_id"),
          // EVERY token carries the replica tag, so replica vocabs
          // are disjoint and cross-replica Jaccard is exactly 0 —
          // true pairs scale linearly with K by construction
          concat_ws(" ", transform(split(col("text"), " ", -1),
            t => concat(lit("r"), col("replica"), lit("_"), t)))
            .as("text"))

    ks.foreach { k =>
      val c = corpus(k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nDocs = c.count()

      var t0 = System.nanoTime()
      val pairs = Dedup.minhashNearDups(c, "doc_id", col("text"),
        threshold = 0.9, numHashes = 16, bands = 16, shingleK = 2)
      val nPairs = pairs.count()
      val tPairs = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      // both counts from ONE pass — persisting the candidate frame
      // would pin ~K*millions of rows for no reason (the OOM at K=300)
      val candRow = Dedup.minhashCandidates(c, "doc_id", col("text"),
          numHashes = 16, bands = 16, shingleK = 2)
        .agg(count(lit(1)).as("n"),
          count(when(col("est_jaccard") >= 0.45, 1)).as("np"))
        .collect()(0)
      val nCand = candRow.getLong(0)
      val nPruned = candRow.getLong(1)
      val tCand = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val nClusters = Dedup.nearDupClusters(pairs).count()
      val tClust = (System.nanoTime() - t0) / 1e9

      println(f"[dedup-bench] k=$k%-3d docs=$nDocs%-7d " +
        f"candidates=$nCand%-9d pruned=$nPruned%-7d pairs=$nPairs%-6d " +
        f"clusters=$nClusters%-5d " +
        f"t_cand=$tCand%6.1fs t_pairs=$tPairs%6.1fs t_clust=$tClust%6.1fs")
      c.unpersist()
      ()
    }
    spark.stop()
  }
}
