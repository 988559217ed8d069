package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Distributed 2-D skyline (Pareto frontier): the rows not dominated
  * by any other row, where `q` dominates `p` iff `q.x >= p.x` and
  * `q.y >= p.y` with at least one strict. Both dimensions are
  * MAXIMIZED (negate a column upstream to minimize it).
  *
  * The operator shape is the textbook two-phase distributed skyline:
  *
  *  1. '''Local pruning''' — each partition is sorted `(x desc,
  *     y desc)` by the engine (`sortWithinPartitions`, no shuffle)
  *     and swept once: a point dominated by a co-partitioned point is
  *     dominated globally, so dropping it locally is always safe.
  *     This is where the data reduction happens — on anything but an
  *     anti-correlated pathology the per-partition frontier is
  *     O(log n), so the surviving set is tiny relative to the input.
  *  2. '''Global merge''' — when the union of local frontiers fits a
  *     task (`mergeMaxRows`), it is re-swept in a single partition.
  *     When a workload's frontier is larger (the anti-correlated
  *     pathology, frontier O(n)), the merge instead RANGE-PARTITIONS
  *     the frontier on `x desc` and sweeps each range with its
  *     cross-partition dominance state injected: equal `x` values
  *     co-locate under range partitioning, so every dominator with
  *     strictly larger `x` lives in an earlier partition, and for the
  *     2-D MAX skyline the only state a partition needs from earlier
  *     ones is their maximum `y` — a per-partition scalar, prefix-
  *     maxed on the driver (partition-count-sized, not data-sized)
  *     and broadcast. One extra narrow pass, no single-task
  *     bottleneck, exact row-for-row semantics either way.
  *
  * Dimension typing is EXACT: integral columns compare as longs
  * (no 2^53 double mantissa cliff), decimals as BigDecimal,
  * float/double as double. A NULL in a dimension throws a clear
  * error naming the column — dominance is undefined on nulls and the
  * caller must filter or impute them first (ADVICE r8).
  *
  * The sweep keeps exact dominance semantics including ties: within
  * an equal-`x` group only the max-`y` rows survive, and only when
  * that max strictly beats the best `y` seen at any strictly larger
  * `x` (a tie there means a dominating point exists). Duplicate
  * `(x, y)` rows all survive — neither dominates the other strictly —
  * which matches the `NOT EXISTS` relational definition the oracle
  * uses, row for row.
  */
object Skyline {

  /** Type-exact dimension accessor + comparator: integrals compare as
    * Long, decimals as BigDecimal, fp as double. Nulls and non-numeric
    * types fail loudly with the column name. */
  private final class Dim(schema: StructType, val name: String)
      extends Serializable {
    val i: Int = schema.fieldIndex(name)
    private val kind: Int = schema(i).dataType match {
      case ByteType | ShortType | IntegerType | LongType => 0
      case FloatType | DoubleType                        => 1
      case _: DecimalType                                => 2
      case other => throw new IllegalArgumentException(
        s"skyline dimension '$name' must be numeric, got type $other")
    }
    /** Extract the dimension value in its exact comparison domain. */
    def get(r: Row): Any = {
      if (r.isNullAt(i)) throw new IllegalArgumentException(
        s"skyline dimension '$name' is NULL: dominance is undefined " +
          "for null dimensions — filter or impute nulls before Skyline")
      kind match {
        case 0 => r.get(i).asInstanceOf[java.lang.Number].longValue()
        case 1 => r.get(i).asInstanceOf[java.lang.Number].doubleValue()
        case _ => r.getDecimal(i)
      }
    }
    /** Compare two values produced by [[get]]. */
    def cmp(a: Any, b: Any): Int = kind match {
      case 0 => java.lang.Long.compare(
        a.asInstanceOf[Long], b.asInstanceOf[Long])
      case 1 => java.lang.Double.compare(
        a.asInstanceOf[Double], b.asInstanceOf[Double])
      case _ => a.asInstanceOf[java.math.BigDecimal]
        .compareTo(b.asInstanceOf[java.math.BigDecimal])
    }
  }

  /** Drop dominated rows (both dims maximized). `mergeMaxRows` caps
    * the single-task merge; above it the distributed range merge
    * engages (see object doc). The operator is EAGER (it must count
    * the local frontier to pick the merge strategy); the returned
    * frame is materialized and lineage-truncated. */
  def skylineMax(df: DataFrame, xCol: String, yCol: String,
                 mergeMaxRows: Long = 2000000L): DataFrame = {
    val enc = Encoders.row(df.schema)
    val dx = new Dim(df.schema, xCol)
    val dy = new Dim(df.schema, yCol)

    /** Sweep a (x desc, y desc)-sorted partition; `startBestY` is the
      * dominance state inherited from strictly-larger-x partitions
      * (null = -infinity). */
    def sweep(it: Iterator[Row], startBestY: Any): Iterator[Row] =
      new Iterator[Row] {
        // one equal-x group buffered at a time
        private val pending = scala.collection.mutable.Queue.empty[Row]
        private var bestY: Any = startBestY
        private var nextGroupHead: Row = if (it.hasNext) it.next() else null
        private def beats(y: Any): Boolean =
          bestY == null || dy.cmp(y, bestY) > 0

        private def refill(): Unit =
          while (pending.isEmpty && nextGroupHead != null) {
            val x = dx.get(nextGroupHead)
            // first in group = group max (sorted y desc)
            val groupMaxY = dy.get(nextGroupHead)
            var r = nextGroupHead
            nextGroupHead = null
            var done = false
            while (!done) {
              // survivors: y ties the group max AND that max strictly
              // beats every y seen at strictly larger x
              if (dy.cmp(dy.get(r), groupMaxY) == 0 && beats(groupMaxY))
                pending += r
              if (it.hasNext) {
                r = it.next()
                if (dx.cmp(dx.get(r), x) != 0) { nextGroupHead = r; done = true }
              } else done = true
            }
            if (beats(groupMaxY)) bestY = groupMaxY
          }

        override def hasNext: Boolean = { refill(); pending.nonEmpty }
        override def next(): Row = { refill(); pending.dequeue() }
      }

    def localPass(d: DataFrame): DataFrame = d
      .sortWithinPartitions(col(xCol).desc, col(yCol).desc)
      .mapPartitions(it => sweep(it, null))(enc)

    val local = localPass(df).persist(StorageLevel.MEMORY_AND_DISK)
    val frontierRows = local.count()
    val merged =
      if (frontierRows <= mergeMaxRows) localPass(local.repartition(1))
      else {
        // Distributed merge. Freeze the range partitioning first
        // (RangePartitioner samples — two jobs over a lazy repartition
        // could disagree on boundaries), then: per-partition max y →
        // driver prefix-max (partition-count-sized) → broadcast →
        // one injected sweep per range. Equal x co-locates, so
        // earlier partitions hold exactly the strictly-larger-x rows.
        // explicit partition count (~mergeMaxRows rows per task) — an
        // unsized repartitionByRange is subject to AQE coalescing,
        // which would fold the merge back into one task
        val perTask = math.max(1L, mergeMaxRows)
        val parts = math.min(10000L,
          math.max(2L, (frontierRows + perTask - 1) / perTask)).toInt
        val ranged = local
          .repartitionByRange(parts, col(xCol).desc)
          .sortWithinPartitions(col(xCol).desc, col(yCol).desc)
          .localCheckpoint(true)
        val rdd = ranged.rdd
        val numParts = rdd.getNumPartitions
        val maxes: Map[Int, Any] = rdd.mapPartitionsWithIndex { (pid, it) =>
          var best: Any = null
          it.foreach { r =>
            val y = dy.get(r)
            if (best == null || dy.cmp(y, best) > 0) best = y
          }
          if (best == null) Iterator.empty else Iterator((pid, best))
        }.collect().toMap
        val prefix = new Array[Any](numParts)
        var run: Any = null
        for (p <- 0 until numParts) {
          prefix(p) = run
          maxes.get(p).foreach { m =>
            if (run == null || dy.cmp(m, run) > 0) run = m
          }
        }
        val bc = df.sparkSession.sparkContext.broadcast(prefix)
        val swept = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
          sweep(it, bc.value(pid))
        }
        df.sparkSession.createDataFrame(swept, df.schema)
      }
    // materialize before dropping the local-frontier cache
    val out = merged.localCheckpoint(true)
    local.unpersist()
    out
  }

  /** d-dimensional skyline (all dimensions maximized), same
    * two-phase shape: the 2-D sort-sweep does not generalize past two
    * dimensions, so the local phase is the block-nested-loop skyline
    * — each partition folds its rows into a running frontier
    * (O(rows × frontier) comparisons, frontier stays small on
    * non-adversarial data), and the union of local frontiers is
    * re-folded in one partition. The merge stays single-partition by
    * design: past 2-D there is no scalar cross-partition dominance
    * state to inject (a range on one dimension bounds nothing about
    * the others), and the merge input is output-bounded. Exact
    * dominance semantics match the 2-D operator: strict in at least
    * one dimension, duplicates survive; integral dims compare as
    * longs, nulls throw naming the column. */
  def skylineMaxN(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.size >= 2, "need at least two dimensions")
    val enc = Encoders.row(df.schema)
    val dv = dims.map(new Dim(df.schema, _)).toArray

    // q dominates p: >= everywhere, > somewhere
    def dominates(q: Array[Any], p: Array[Any]): Boolean = {
      var ge = true
      var gt = false
      var i = 0
      while (i < dv.length && ge) {
        val c = dv(i).cmp(q(i), p(i))
        if (c < 0) ge = false else if (c > 0) gt = true
        i += 1
      }
      ge && gt
    }
    def bnl(it: Iterator[Row]): Iterator[Row] = {
      val frontier = scala.collection.mutable.ArrayBuffer.empty[(Row, Array[Any])]
      it.foreach { p =>
        val pv = dv.map(_.get(p))
        if (!frontier.exists { case (_, qv) => dominates(qv, pv) }) {
          val keep = frontier.filterNot { case (_, qv) => dominates(pv, qv) }
          frontier.clear()
          frontier ++= keep
          frontier += ((p, pv))
        }
      }
      frontier.iterator.map(_._1)
    }
    df.mapPartitions(bnl _)(enc).repartition(1).mapPartitions(bnl _)(enc)
  }

  /** Convenience: skyline with per-dimension direction flags
    * (`true` = maximize). Minimized dimensions are negated into
    * shadow columns for the sweep, then restored. */
  def skyline(df: DataFrame, x: (String, Boolean), y: (String, Boolean))
      : DataFrame = {
    def arranged(c: (String, Boolean)): (String, Column) =
      if (c._2) (c._1, col(c._1)) else (s"__neg_${c._1}", -col(c._1))
    val (xn, xc) = arranged(x)
    val (yn, yc) = arranged(y)
    val prep = df.withColumn(xn, xc).withColumn(yn, yc)
    skylineMax(prep, xn, yn).select(df.columns.map(col).toSeq: _*)
  }
}
