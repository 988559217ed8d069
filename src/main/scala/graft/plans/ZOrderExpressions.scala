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
