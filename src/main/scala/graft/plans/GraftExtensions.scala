package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the registered `is_valid_domain` Scala UDF
  * into the codegen'd native expression — ad-hoc SQL written against
  * the UDF gets the native plan for free (§4 optional rule (a) in
  * SURVEY). Semantics are identical by DomainExpressionsSpec. */
object RewriteValidatorUdf extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case u: ScalaUDF if u.udfName.contains("is_valid_domain") &&
          u.children.size == 1 =>
        IsValidDomainExpr(u.children.head)
    }
}

/** SparkSessionExtensions entry point: install with
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  *
  * Injects the native expression layer into the SQL function registry so
  * `spark.sql("... is_valid_domain_native(d)")` plans the codegen'd
  * expression rather than a UDF black box.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.isValidDomainEntry)
    ext.injectOptimizerRule(_ => RewriteValidatorUdf)
  }
}

object GraftExtensions {
  private val isValidDomainEntry = (
    FunctionIdentifier("is_valid_domain_native"),
    IsValidDomainExpr.info,
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      IsValidDomainExpr(children.head))

  /** Register the native functions on an already-built session
    * (idempotent) — for callers that didn't pass the extensions class
    * at session build time. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (ident, info, builder) = isValidDomainEntry
    spark.sessionState.functionRegistry
      .registerFunction(ident, info, builder)
  }
}
