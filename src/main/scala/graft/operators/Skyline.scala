package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

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
  *  2. '''Global merge''' — the union of local frontiers (≤ parts ×
  *     local-frontier-size rows) is re-swept in a single partition.
  *     At 100 TB phase 2's input is still only the concatenation of
  *     per-partition frontiers, not the data; if a workload ever had
  *     a frontier too large for one task, phase 2 re-range-partitions
  *     on x and repeats — not needed for any realistic frontier.
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

  /** Append nothing, drop dominated rows; `xCol`/`yCol` must be
    * numeric (compared as double — exact for longs below 2^53 and for
    * identically-derived doubles). */
  def skylineMax(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val enc = Encoders.row(df.schema)
    val xi = df.schema.fieldIndex(xCol)
    val yi = df.schema.fieldIndex(yCol)

    def sweep(it: Iterator[Row]): Iterator[Row] = new Iterator[Row] {
      // one equal-x group buffered at a time; input sorted (x desc, y desc)
      private val pending = scala.collection.mutable.Queue.empty[Row]
      private var bestY = Double.NegativeInfinity
      private var nextGroupHead: Row = if (it.hasNext) it.next() else null

      private def num(r: Row, i: Int): Double =
        r.get(i) match {
          case n: java.lang.Number => n.doubleValue()
          case other => throw new IllegalArgumentException(
            s"skyline dimension must be numeric, got: $other")
        }

      private def refill(): Unit =
        while (pending.isEmpty && nextGroupHead != null) {
          val x = num(nextGroupHead, xi)
          val groupMaxY = num(nextGroupHead, yi) // first in group = max (sorted y desc)
          var r = nextGroupHead
          nextGroupHead = null
          var done = false
          while (!done) {
            // survivors: y ties the group max AND that max strictly
            // beats every y seen at strictly larger x
            if (num(r, yi) == groupMaxY && groupMaxY > bestY) pending += r
            if (it.hasNext) {
              r = it.next()
              if (num(r, xi) != x) { nextGroupHead = r; done = true }
            } else done = true
          }
          if (groupMaxY > bestY) bestY = groupMaxY
        }

      override def hasNext: Boolean = { refill(); pending.nonEmpty }
      override def next(): Row = { refill(); pending.dequeue() }
    }

    def pass(d: DataFrame): DataFrame = d
      .sortWithinPartitions(col(xCol).desc, col(yCol).desc)
      .mapPartitions(sweep _)(enc)

    pass(pass(df).repartition(1))
  }

  /** d-dimensional skyline (all dimensions maximized), same
    * two-phase shape: the 2-D sort-sweep does not generalize past two
    * dimensions, so the local phase is the block-nested-loop skyline
    * — each partition folds its rows into a running frontier
    * (O(rows × frontier) comparisons, frontier stays small on
    * non-adversarial data), and the union of local frontiers is
    * re-folded in one partition. Exact dominance semantics match
    * the 2-D operator: strict in at least one dimension, duplicates
    * survive. */
  def skylineMaxN(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.size >= 2, "need at least two dimensions")
    val enc = Encoders.row(df.schema)
    val idx = dims.map(df.schema.fieldIndex).toArray

    def num(r: Row, i: Int): Double = r.get(i) match {
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalArgumentException(
        s"skyline dimension must be numeric, got: $other")
    }
    // q dominates p: >= everywhere, > somewhere
    def dominates(q: Row, p: Row): Boolean = {
      var ge = true
      var gt = false
      var i = 0
      while (i < idx.length && ge) {
        val d = num(q, idx(i)) - num(p, idx(i))
        if (d < 0) ge = false else if (d > 0) gt = true
        i += 1
      }
      ge && gt
    }
    def bnl(it: Iterator[Row]): Iterator[Row] = {
      val frontier = scala.collection.mutable.ArrayBuffer.empty[Row]
      it.foreach { p =>
        if (!frontier.exists(q => dominates(q, p))) {
          val keep = frontier.filterNot(q => dominates(p, q))
          frontier.clear()
          frontier ++= keep
          frontier += p
        }
      }
      frontier.iterator
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
