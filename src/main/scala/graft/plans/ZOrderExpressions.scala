package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave — the multi-dimensional clustering key
  * behind data-skipping layouts: sorting on `z(x, y)` places rows
  * close in BOTH dimensions into the same files, so min/max footer
  * stats prune box predicates on either column (a linear sort only
  * prunes its leading column).
  *
  * `graft_zorder(x, y)`: low [[ZOrderOps.Bits]] bits of each long,
  * bit-interleaved (x gets the even result bits, y the odd) into one
  * sortable long. Inputs are masked, not range-checked — callers
  * normalize dimensions into the 21-bit domain first (rank or
  * truncate); the mask keeps the expression total and the layout
  * deterministic either way. */
object ZOrderOps {
  /** 21 bits per dimension → 42-bit codes: the widest symmetric
    * 2-D interleave that stays in a positive long. */
  val Bits = 21
  val Mask: Long = (1L << Bits) - 1

  /** Spread the low 21 bits of `v` so bit i lands at bit 2i — the
    * classic parallel-prefix bit spread (public-domain "Bit Twiddling
    * Hacks" constant family, widened to 64-bit). */
  def spread(v: Long): Long = {
    var x = v & Mask
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  /** 3-D spread: bit i lands at bit 3i (21 bits × 3 dims = 63 bits,
    * still a positive long). Same parallel-prefix family, every-third
    * constants. */
  def spread3(v: Long): Long = {
    var x = v & Mask
    x = (x | (x << 32)) & 0x1f00000000ffffL
    x = (x | (x << 16)) & 0x1f0000ff0000ffL
    x = (x | (x << 8)) & 0x100f00f00f00f00fL
    x = (x | (x << 4)) & 0x10c30c30c30c30c3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  def interleave3(x: Long, y: Long, z: Long): Long =
    spread3(x) | (spread3(y) << 1) | (spread3(z) << 2)
}

/** Native codegen'd `graft_zorder(x, y)` — stays inside
  * whole-stage codegen so a z-ordered write's sort key costs two
  * dozen ALU ops per row, no virtual calls. */
case class ZOrderExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BIGINT, BIGINT), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderOps.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.ZOrderOps.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[ZOrderExpr], "graft_zorder")
}

/** Native codegen'd `graft_zorder3(x, y, z)` — three 21-bit
  * dimensions into a 63-bit Morton code; the layout key when scans
  * filter boxes in three dimensions (e.g. tenant × time × key). */
case class ZOrder3Expr(first: Expression, second: Expression,
                       third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BIGINT, BIGINT, BIGINT), got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder3"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ZOrderOps.interleave3(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.plans.ZOrderOps.interleave3($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): ZOrder3Expr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ZOrder3Expr {
  val info: ExpressionInfo =
    VectorHashExpressions.info(classOf[ZOrder3Expr], "graft_zorder3")
}
