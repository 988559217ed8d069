package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

object ProbeScrub {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("probe")
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.query.DedupQueries.scrubSpans(spark, "/tmp/graft_sf100")
    println("[probe] ==== count() optimized plan ====")
    println(df.groupBy().count().queryExecution.optimizedPlan.treeString.take(4000))
    val t0 = System.nanoTime
    val n = df.count()
    println(s"[probe] count=$n sec=${(System.nanoTime - t0) / 1e9}")
    // forcing action: touch report columns
    val t2 = System.nanoTime
    val r = df.agg(sum(col("dup_tokens")), sum(length(col("clean_text")))).head()
    println(s"[probe] forced=$r sec=${(System.nanoTime - t2) / 1e9}")
    spark.stop()
  }
}
