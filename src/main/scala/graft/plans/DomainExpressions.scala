package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the domain hot path.
  *
  * A Scala UDF forces Catalyst to treat the call as an opaque black box
  * (no null-safety elision, boxing via the encoder bridge, breaks
  * whole-stage pipelining assumptions); a native `Expression` with
  * `doGenCode` emits a direct static call inside the generated code.
  * The semantics are exactly [[graft.functions.DomainFunctions]] — the
  * expression layer adds codegen, never behavior.
  */
object DomainExpressions {

  /** Validator working directly on UTF8String bytes (ASCII rules, so
    * byte-wise scanning is exact): avoids the String allocation of the
    * pure-Scala form in the per-row path. */
  def isValidDomainUtf8(s: UTF8String): Boolean = {
    if (s == null) return false
    val n = s.numBytes()
    if (n == 0 || n > 254) return false
    var last: Byte = '.'
    var nonNumeric = false
    var partlen = 0
    var i = 0
    while (i < n) {
      val c = s.getByte(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_') {
        nonNumeric = true; partlen += 1
      } else if (c >= '0' && c <= '9') {
        partlen += 1
      } else if (c == '-') {
        if (last == '.') return false
        nonNumeric = true; partlen += 1
      } else if (c == '.') {
        if (last == '.' || last == '-') return false
        if (partlen > 63 || partlen == 0) return false
        partlen = 0
      } else {
        return false  // any non-ASCII byte is also rejected here
      }
      last = c
      i += 1
    }
    if (n == 254 && last != '.') return false
    if (last == '-' || partlen > 63) return false
    nonNumeric
  }

  /** F2+F3 in one call: valid -> unchanged; `*.`/`\"`-prefixed with a
    * valid remainder -> repaired; else null — the Go keep-repaired
    * semantics of [[graft.functions.DomainFunctions.validOrRepaired]]
    * (which is the source of truth; the column form previously inlined
    * the validator three times plus substring branches). */
  def validOrRepairedUtf8(s: UTF8String): UTF8String =
    graft.functions.DomainFunctions.validOrRepaired(s.toString) match {
      case Some(d) => UTF8String.fromString(d)
      case None    => null
    }
}

/** `is_valid_domain_native(domain)` — codegen'd Go-semantics validator.
  *
  * Non-nullable: NULL input yields `false`, exactly like the registered
  * `is_valid_domain` Scala UDF it replaces (`isValidDomain(null)` is
  * false), so [[RewriteValidatorUdf]] is semantics-preserving on NULL
  * domains — including under negation (`NOT is_valid_domain(d)`). */
case class IsValidDomainExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"is_valid_domain_native requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "is_valid_domain_native"

  override def eval(input: InternalRow): Any =
    DomainExpressions.isValidDomainUtf8(
      child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = graft.plans.DomainExpressions.isValidDomainUtf8(
          ${c.isNull} ? null : ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : IsValidDomainExpr = copy(child = newChild)
}

object IsValidDomainExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[IsValidDomainExpr].getName, "is_valid_domain_native")
}

/** `valid_or_repaired_native(domain)` — codegen'd repair-then-filter
  * (F2+F3). NULL for unrepairable input. */
case class ValidOrRepairedExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"valid_or_repaired_native requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "valid_or_repaired_native"

  override protected def nullSafeEval(input: Any): Any =
    DomainExpressions.validOrRepairedUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val res = ctx.freshName("repaired")
      s"""
        UTF8String $res = graft.plans.DomainExpressions.validOrRepairedUtf8($c);
        if ($res == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $res; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression)
      : ValidOrRepairedExpr = copy(child = newChild)
}

object ValidOrRepairedExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ValidOrRepairedExpr].getName, "valid_or_repaired_native")
}
