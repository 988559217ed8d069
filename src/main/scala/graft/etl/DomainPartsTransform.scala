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

    df
      .withColumn("__labels", splitLikeJava(lower(col(domainCol)), "\\."))
      .withColumn("__n", size(col("__labels")))
      .withColumn("__l2cand", when(n >= 2, lab(n - 1)))
      .join(broadcast(tldDf), Seq("__l2cand"), "left")
      .withColumn("__has_l2", coalesce(col("__is_l2"), lit(false)) && n >= 2)
      .withColumn("dp_success", coalesce(n >= 2, lit(false)))
      .withColumn("apex",
        when(!col("dp_success"), lit(""))
          .otherwise(concat_ws(".", slice(col("__labels"),
            // 1-based start = labelIndex+1; labelIndex = max(l2idx-1, 0)
            // with 0-based l2idx = n-2 (has l2) or n-1 (no l2)
            greatest(when(col("__has_l2"), n - 2).otherwise(n - 1), lit(1)),
            // length to end of array
            n - greatest(when(col("__has_l2"), n - 2).otherwise(n - 1), lit(1)) + 1)))
      )
      .withColumn("p1", when(col("dp_success"), lab(n)).otherwise(""))
      .withColumn("p2",
        when(col("dp_success") && col("__has_l2"), lab(n - 1)).otherwise(""))
      .withColumn("p3",
        when(col("dp_success") && !col("__has_l2"), lab(n - 1)).otherwise(""))
      .withColumn("p4", when(n >= 3, lab(n - 2)).otherwise(""))
      .withColumn("p5", when(n >= 4, lab(n - 3)).otherwise(""))
      .withColumn("p6", when(n >= 5, lab(n - 4)).otherwise(""))
      .withColumn("p7", when(n >= 6, lab(n - 5)).otherwise(""))
      .drop("__labels", "__n", "__l2cand", "__is_l2", "__has_l2")
  }
}
