package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** As-of join as a first-class operator: custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`, registered through
  * [[GraftExtensions]] — the (c) rung of the extension ladder, used
  * where composition genuinely leaves performance on the table.
  *
  * The composed form ([[graft.query.QueryOps.asofJoin]]) unions
  * null-padded copies of both sides and runs a running-`last` window:
  * correct, but it shuffles BOTH sides widened to the union schema and
  * the window keeps per-column state. This operator is the classic
  * sort-merge as-of: co-partition on keys, sort each side once, one
  * forward merge per partition holding exactly ONE buffered right row.
  * No union blow-up, no window buffers, each side shuffles its own
  * (pruned) schema.
  *
  * Semantics (locked by AsofJoinNativeSpec equivalence with the
  * composed form, and by the q_asof_latest_order DuckDB native-ASOF
  * oracle): for each left row, the right row with the greatest
  * `rightTime <= leftTime` (inclusive) within the same key group;
  * NULL right values when none precedes. Right side unique per
  * (keys, rightTime); sides must be distinct sources.
  *
  * NULL handling — deliberate divergence from DuckDB's native
  * ASOF JOIN: NULL keys and NULL times order as the SMALLEST values
  * (Spark's natural ascending ordering), so a NULL left key matches
  * NULL-key right rows and a NULL `rightTime` row precedes every left
  * time, whereas DuckDB never matches NULL keys/times. This is
  * self-consistent with the composed union+window form
  * (`Window.partitionBy` also groups NULLs together and
  * nulls-first-orders the running `last`), which is the engine's
  * source of truth; the q_asof_latest_order oracle data contains no
  * NULL keys or timestamps, so both readings agree there. Locked by
  * the NULL-key/NULL-time case in AsofJoinSpec.
  */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression],
                        rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        rightValues: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] as [[AsofJoinExec]]. */
object AsofJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, rv) =>
      AsofJoinExec(lk, rk, lt, rt, rv, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join: children co-partitioned on the keys and
  * sorted by (keys, time); each partition merges forward buffering a
  * single right row. O(left + right) per partition after the sort,
  * O(1) state. */
case class AsofJoinExec(leftKeys: Seq[Expression],
                        rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        rightValues: Seq[Attribute],
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    require(rightTime.dataType == timeType,
      s"asof time types differ: $timeType vs ${rightTime.dataType}")
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lt = leftTime
    val rt = rightTime
    val rv: Seq[Expression] = rightValues
    val numRightValues = rightValues.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val leftKeyGen = UnsafeProjection.create(lk, leftOut)
      val rightKeyGen = UnsafeProjection.create(rk, rightOut)
      val leftTimeGen = UnsafeProjection.create(Seq(lt), leftOut)
      val rightTimeGen = UnsafeProjection.create(Seq(rt), rightOut)
      val rightValsGen = UnsafeProjection.create(rv, rightOut)
      val resultGen = UnsafeProjection.create(outAttrs, outAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullRight = new GenericInternalRow(numRightValues)
      val joined = new JoinedRow

      // single-row lookahead over the right side; projections reuse
      // buffers, so anything held across advances is copied
      var rNext: InternalRow = null
      var rNextKey: InternalRow = null
      var rNextTime: InternalRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rNext = rIter.next().copy()
          rNextKey = rightKeyGen(rNext).copy()
          rNextTime = rightTimeGen(rNext).copy()
        } else {
          rNext = null; rNextKey = null; rNextTime = null
        }
      advanceRight()

      var lastR: InternalRow = null      // most recent right row consumed
      var lastRKey: InternalRow = null   // ...and its key

      lIter.map { l =>
        val lKey = leftKeyGen(l)
        val lTime = leftTimeGen(l)
        // drop right rows of keys strictly before the current left key
        // (left keys ascend — they can never match again), then consume
        // same-key rows with time <= left time, remembering the last
        while (rNext != null && {
          val c = keyOrd.compare(rNextKey, lKey)
          c < 0 || (c == 0 && timeOrd.compare(rNextTime, lTime) <= 0)
        }) {
          if (keyOrd.compare(rNextKey, lKey) == 0) {
            lastR = rNext; lastRKey = rNextKey
          }
          advanceRight()
        }
        val rightRow =
          if (lastRKey != null && keyOrd.compare(lastRKey, lKey) == 0)
            rightValsGen(lastR)
          else nullRight
        resultGen(joined(l, rightRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoin {

  /** Build the operator against two DataFrames, resolving columns by
    * name (keys share names across sides; `rightValues` must not clash
    * with left columns). Requires [[GraftExtensions]] on the session
    * (injects [[AsofJoinStrategy]]). */
  def apply(leftDf: DataFrame, rightDf: DataFrame, keys: Seq[String],
            leftTime: String, rightTime: String,
            rightValues: Seq[String]): DataFrame = {
    val spark = leftDf.sparkSession
    GraftExtensions.installStrategy(spark)
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not found in ${plan.output.map(_.name)}"))
    val node = AsofJoinPlan(lPlan, rPlan,
      keys.map(resolve(lPlan, _)), keys.map(resolve(rPlan, _)),
      resolve(lPlan, leftTime), resolve(rPlan, rightTime),
      rightValues.map(resolve(rPlan, _)))
    org.apache.spark.sql.graftbridge.GraftBridge.ofRows(spark, node)
  }
}
