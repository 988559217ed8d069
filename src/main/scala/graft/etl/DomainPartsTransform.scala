package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Dims

/** Column-expression implementation of the reference's `getDomainParts`
  * (App.java:744-825, observable semantics as in
  * [[graft.functions.DomainFunctions.domainParts]]).
  *
  * Spark-first: the only non-expression piece is the l2-TLD membership
  * test, done as a broadcast left join against the TLD dim — the fact
  * side never shuffles and every derived column is whole-stage-codegen.
  * The UDF variant exists for ad-hoc SQL; THIS is the bulk path.
  */
object DomainPartsTransform {

  /** Reference HOF form of [[splitLikeJava]] — kept as the spec
    * cross-check for the native expression. */
  private[graft] def splitLikeJavaHof(c: org.apache.spark.sql.Column,
                                      pattern: String): org.apache.spark.sql.Column = {
    val raw = split(c, pattern, -1)
    val lastNonEmpty = array_max(transform(raw,
      (x, i) => when(x =!= "", i + 1).otherwise(0)))
    slice(raw, lit(1), coalesce(lastNonEmpty, lit(0)))
  }

  /** Java `String.split(regex)` drops trailing empty strings; Spark's
    * `split` keeps them regardless of limit. This trims them off:
    * `["a","","b","",""]` -> `["a","","b"]`, all-empty -> `[]`.
    * One native compiled call ([[graft.plans.SplitJavaExpr]]); the HOF
    * form paid four array passes per row in the ETL hot path. */
  def splitLikeJava(c: org.apache.spark.sql.Column,
                    pattern: String): org.apache.spark.sql.Column = {
    graft.plans.GraftExtensions.install(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_split_java", c, lit(pattern))
  }

  /** Adds `outCol` = the TLD-aware apex of `domainCol` in Go cleaner
    * semantics ([[graft.functions.DomainFunctions.apexDomain]]: NO case
    * folding, Java split, single-label input unchanged) — as columns:
    * the l2-TLD membership is a broadcast left join, the slice is a
    * codegen'd expression chain. No UDF anywhere in the plan.
    *
    * Index bookkeeping (n = label count, 1-based Spark arrays): the
    * apex starts at max(n-3, 0)+1 when the second-to-last label is a
    * TLD, else max(n-2, 0)+1, and runs to the end. */
  def withTldAwareApex(df: DataFrame, domainCol: String, tlds: Set[String],
                       outCol: String): DataFrame = {
    val spark = df.sparkSession
    val tldDf = Dims.tldDf(spark, tlds)
      .withColumnRenamed("tld", "__al2cand")
      .withColumn("__ais_l2", lit(true))
    val n = col("__an")
    val start0 = when(coalesce(col("__ais_l2"), lit(false)),
      greatest(n - 3, lit(0))).otherwise(greatest(n - 2, lit(0)))
    df
      .withColumn("__alabels", splitLikeJava(col(domainCol), "\\."))
      .withColumn("__an", size(col("__alabels")))
      .withColumn("__al2cand", when(n >= 2, element_at(col("__alabels"), n - 1)))
      .join(broadcast(tldDf), Seq("__al2cand"), "left")
      .withColumn(outCol,
        when(col(domainCol).isNull, lit(null).cast("string"))
          .when(n <= 1, col(domainCol))
          .otherwise(concat_ws(".",
            slice(col("__alabels"), start0 + 1, n - start0))))
      .drop("__alabels", "__an", "__al2cand", "__ais_l2")
  }

  /** Adds `dp_success, apex, p1..p7` derived from `domainCol`.
    * Internal columns are dropped. */
  def withDomainParts(df: DataFrame, domainCol: String,
                      tlds: Set[String]): DataFrame = {
    val spark = df.sparkSession
    val tldDf = Dims.tldDf(spark, tlds)
      .withColumnRenamed("tld", "__l2cand")
      .withColumn("__is_l2", lit(true))

    val n = col("__n")
    def lab(i: org.apache.spark.sql.Column) = element_at(col("__labels"), i)

    graft.plans.GraftExtensions.install(spark)
    // slot derivation is ONE native struct call
    // (plans.DomainSlotsExpr) — the previous per-column when-chains
    // were a large codegen footprint in the migrator hot path; the
    // l2-TLD membership stays a broadcast join (the right shape for a
    // dim that can grow)
    df
      .withColumn("__labels", splitLikeJava(lower(col(domainCol)), "\\."))
      .withColumn("__n", size(col("__labels")))
      .withColumn("__l2cand", when(n >= 2, lab(n - 1)))
      .join(broadcast(tldDf), Seq("__l2cand"), "left")
      .withColumn("__has_l2", coalesce(col("__is_l2"), lit(false)) && n >= 2)
      .withColumn("__slots", call_function("graft_domain_slots",
        col("__labels"), col("__has_l2")))
      .withColumn("dp_success", col("__slots").getField("dp_success"))
      .withColumn("apex", col("__slots").getField("apex"))
      .withColumn("p1", col("__slots").getField("p1"))
      .withColumn("p2", col("__slots").getField("p2"))
      .withColumn("p3", col("__slots").getField("p3"))
      .withColumn("p4", col("__slots").getField("p4"))
      .withColumn("p5", col("__slots").getField("p5"))
      .withColumn("p6", col("__slots").getField("p6"))
      .withColumn("p7", col("__slots").getField("p7"))
      .drop("__labels", "__n", "__l2cand", "__is_l2", "__has_l2", "__slots")
  }
}
