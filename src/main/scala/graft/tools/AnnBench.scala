package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Similarity

/** Scale-curve harness for queries-vs-corpus ANN: a FIXED 200-query
  * set searches a corpus replicated K times (vec_id offset per
  * replica; vectors unchanged, so cell occupancy — and therefore
  * per-query candidate count — grows exactly linearly with K).
  * Measures IVF-PQ wall time at each K; brute-force truth is
  * infeasible at the large points by design, so this measures
  * throughput, not recall (recall is oracle-gated at the bounded
  * sizes by q_sim_pq_recall).
  *
  * {{{ sbt "runMain graft.tools.AnnBench [sfDir] [K1,K2,...]" }}}
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.drop(1).headOption.getOrElse("1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.getOrCreate("graft-ann-bench")
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val queries = base.filter(col("vec_id") < 200).persist()
    queries.count()

    def corpus(k: Int): DataFrame =
      if (k == 1) base
      else base.crossJoin(
          spark.range(k).select(col("id").as("replica")))
        .select((col("vec_id") + col("replica") * 10000000L)
          .as("vec_id"), col("embedding"))

    val qframe = queries
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    ks.foreach { k =>
      val c = corpus(k).persist()
      val n = c.count()
      var t0 = System.nanoTime()
      val index = Similarity.buildPqIndex(c, "vec_id", "embedding",
        nlist = 16, m = 8, ksub = 16).persisted()
      val nIdx = index.assigned.count() // materialize the encode
      val tBuild = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val rows = Similarity.pqSearchIndex(qframe, index, k = 5,
        nprobe = 4, rerank = 64).count()
      val tSearch = (System.nanoTime() - t0) / 1e9
      println(f"[ann-bench] k=$k%-3d corpus=$n%-8d encoded=$nIdx%-8d " +
        f"results=$rows%-5d t_build=$tBuild%6.1fs t_search=$tSearch%6.1fs")
      index.unpersist()
      c.unpersist()
      ()
    }
    spark.stop()
  }
}
