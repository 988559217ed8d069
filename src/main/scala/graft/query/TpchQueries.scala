package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Classic TPC-H-shaped analytics over the synthetic tables — the
  * join-heavy relational core a warehouse migration is judged on,
  * adapted to the columns this corpus ships. Both are
  * dimension-broadcast plans: the fact tables shuffle only for their
  * aggregate keys, never to be enriched; revenue math runs in
  * DECIMAL(18,2) end to end and crosses to double only on the wire. */
object TpchQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val revenue =
    sum(col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") -
        col("l_discount").cast("decimal(18,2)")))

  /** Q3 shape — shipping-priority: top-10 open orders by outstanding
    * revenue for one market segment (ordered before the cutoff,
    * shipped after it). Customer prunes orders through a broadcast
    * semi-ish join; the only wide operation is the per-order
    * aggregate; top-10 is a TakeOrderedAndProject. */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cutoff = "1998-06-15"
    val cust = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "MACHINERY")
      .select("c_custkey")
    val orders = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(revenue.cast("double").as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  val q3ShippingPrioritySql: String =
    """SELECT l.l_orderkey,
      |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1 AS DECIMAL(18,2))
      |         - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS revenue
      |FROM lineitem l
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |WHERE c.c_mktsegment = 'MACHINERY'
      |  AND o.o_orderdate < TIMESTAMP '1998-06-15'
      |  AND l.l_shipdate > TIMESTAMP '1998-06-15'
      |GROUP BY 1, 2
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Q5 shape — local-supplier volume: revenue per nation for one
    * region and one year, counting only lineitems whose supplier sits
    * in the customer's nation (the co-location predicate that makes
    * Q5 a five-way join). nation/region/supplier broadcast; the
    * orders-lineitem join shuffles on orderkey; the final aggregate
    * is nation-count-sized. */
  def q5LocalSupplierVolume(s: SparkSession, dir: String): DataFrame = {
    val nat = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region")
          .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = t(s, dir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val supp = t(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val orders = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey")
        && cust("c_nationkey") === supp("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(revenue.cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  val q5LocalSupplierVolumeSql: String =
    """SELECT n.n_name,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
      |      * (CAST(1 AS DECIMAL(18,2))
      |         - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS revenue
      |FROM lineitem l
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  AND s.s_nationkey = c.c_nationkey
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |JOIN region r ON r.r_regionkey = n.n_regionkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] =
    Map(
      "q_tpch_q3" -> (q3ShippingPriority _, q3ShippingPrioritySql),
      "q_tpch_q5" -> (q5LocalSupplierVolume _, q5LocalSupplierVolumeSql))
}
