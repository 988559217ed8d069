package graft

import org.apache.spark.sql.SparkSession
import graft.functions.{DomainFunctions, IpFunctions}
import graft.plans.GraftExtensions
import graft.sources.{Dims, Tables}

/** Library facade: one call wires a session for interactive/SQL use —
  * temp views for the testdata tables, all scalar UDFs, and the native
  * expression layer.
  *
  * {{{
  * val spark = GraftSession.getOrCreate()
  * Graft.init(spark, "/root/testdata/sf0.01")
  * spark.sql("SELECT apex_domain(domain) ... ")
  * }}}
  */
object Graft {
  def init(spark: SparkSession, sfDir: String,
           tlds: Set[String] = Dims.defaultTlds): Unit = {
    Tables.registerAll(spark, sfDir)
    DomainFunctions.register(spark, tlds)
    IpFunctions.register(spark)
    GraftExtensions.install(spark)
  }
}
