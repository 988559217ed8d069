package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
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

  private val EMPTY = UTF8String.EMPTY_UTF8
  private val DOT = UTF8String.fromString(".")
  private def slotsFailure: Any =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](false, EMPTY, EMPTY, EMPTY, EMPTY, EMPTY, EMPTY, EMPTY,
        EMPTY))

  /** X1 slot layout in one call: (dp_success, apex, p1..p7) from the
    * lowered label array and the l2-TLD membership flag — the exact
    * per-column when-chains of the previous column form (which were a
    * large codegen footprint in the migrator hot path). Failure rows
    * (fewer than 2 labels, or null input) carry `false` + empty
    * strings, matching `coalesce(n >= 2, false)` + `otherwise("")`. */
  def domainSlots(labels: ArrayData, hasL2: Boolean): Any = {
    if (labels == null) return slotsFailure
    val n = labels.numElements()
    if (n < 2) return slotsFailure
    def lab(i1: Int): UTF8String = labels.getUTF8String(i1 - 1)
    val p1 = lab(n)
    val p2 = if (hasL2) lab(n - 1) else EMPTY
    val p3 = if (!hasL2) lab(n - 1) else EMPTY
    val p4 = if (n >= 3) lab(n - 2) else EMPTY
    val p5 = if (n >= 4) lab(n - 3) else EMPTY
    val p6 = if (n >= 5) lab(n - 4) else EMPTY
    val p7 = if (n >= 6) lab(n - 5) else EMPTY
    val start = math.max(if (hasL2) n - 2 else n - 1, 1)
    val apex = UTF8String.concatWs(DOT, (start to n).map(lab): _*)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](true, apex, p1, p2, p3, p4, p5, p6, p7))
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
  // Unrepairable input yields NULL even from a non-nullable child —
  // the default (child.nullable) would emit `isNull = true` against an
  // undeclared local in nullSafeCodeGen's non-nullable branch.
  override def nullable: Boolean = true
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

/** `graft_domain_slots(labels, has_l2)` — the X1 slot struct in one
  * codegen'd call. Non-nullable: null labels produce the failure row,
  * mirroring the old column form's coalesce defaults. */
case class DomainSlotsExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(StringType, _),
            org.apache.spark.sql.types.BooleanType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_domain_slots requires (ARRAY<STRING>, BOOLEAN), got $other")
    }

  override val dataType: DataType = {
    import org.apache.spark.sql.types._
    StructType(
      StructField("dp_success", BooleanType, nullable = false) +:
      ("apex" +: (1 to 7).map(i => s"p$i")).map(n =>
        StructField(n, StringType, nullable = false)))
  }
  override def nullable: Boolean = false
  override def prettyName: String = "graft_domain_slots"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    DomainExpressions.domainSlots(l.asInstanceOf[ArrayData],
      r != null && r.asInstanceOf[Boolean])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        InternalRow ${ev.value} = (InternalRow)
          graft.plans.DomainExpressions.domainSlots(
            ${l.isNull} ? null : ${l.value},
            ${r.isNull} ? false : ${r.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DomainSlotsExpr =
    copy(left = newLeft, right = newRight)
}

object DomainSlotsExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DomainSlotsExpr].getName, "graft_domain_slots")
}
