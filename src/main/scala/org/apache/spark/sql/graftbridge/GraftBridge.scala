package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` access bridge: wrap a custom LogicalPlan in
  * a DataFrame. Lives under `org.apache.spark.sql` solely to reach
  * `classic.Dataset.ofRows` (the conventional pattern for Spark
  * extension libraries that ship custom plan nodes); nothing else from
  * the internal surface is touched. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
