package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** SpaceSaving heavy hitters — a MERGEABLE bounded-memory sketch of
  * the top frequent values of a column (Metwally et al.'s Space-Saving
  * summary, the standard frequent-items structure).
  *
  * Guarantees (capacity m over a stream of N occurrences):
  *   - every value with true count > N/m IS in the summary;
  *   - each reported count OVERestimates the true count, by at most
  *     the recorded error.
  * Both survive partition merges (the absent side's minimum count is
  * added as overestimate + error), so the executor-side partial
  * aggregation Spark runs for any UDAF is exactly the sketch's native
  * merge — N/m accuracy at any scale with m-bounded state per
  * partition, no second pass over the data.
  *
  * The summary CONTENT below the guarantee line depends on merge
  * order (Spark does not fix partition order), so driver-contract
  * queries gate the guarantee BOOLEANS against exact counts rather
  * than hashing the raw summary ([[graft.query.TextQueries]]).
  */
object HeavyHitters {

  /** (value, count, maxError) row of the final summary. */
  case class Entry(term: String, cnt: Long, err: Long)

  type Buf = Map[String, (Long, Long)] // value -> (count, maxError)

  // smallest count first; ties to the GREATEST key (both arbitrary
  // for the guarantee — fixed so single-partition runs are stable)
  private val evictionOrder: Ordering[(String, (Long, Long))] =
    new Ordering[(String, (Long, Long))] {
      override def compare(a: (String, (Long, Long)),
                           b: (String, (Long, Long))): Int = {
        val c = java.lang.Long.compare(a._2._1, b._2._1)
        if (c != 0) c else b._1.compareTo(a._1)
      }
    }

  class SpaceSaving(m: Int)
      extends Aggregator[String, Buf, Seq[Entry]] {
    require(m > 0, "capacity must be positive")

    override def zero: Buf = Map.empty

    override def reduce(b: Buf, a: String): Buf =
      b.get(a) match {
        case Some((c, e)) => b.updated(a, (c + 1, e))
        case None if b.size < m => b.updated(a, (1L, 0L))
        case None =>
          val (victim, (vc, _)) = b.min(evictionOrder)
          (b - victim).updated(a, (vc + 1, vc))
      }

    override def merge(b1: Buf, b2: Buf): Buf = {
      if (b1.isEmpty) return b2
      if (b2.isEmpty) return b1
      // a key absent from a FULL side may still have occurred up to
      // that side's minimum count there
      val floor1 = if (b1.size >= m) b1.min(evictionOrder)._2._1 else 0L
      val floor2 = if (b2.size >= m) b2.min(evictionOrder)._2._1 else 0L
      val combined = (b1.keySet ++ b2.keySet).iterator.map { k =>
        val (c1, e1) = b1.getOrElse(k, (floor1, floor1))
        val (c2, e2) = b2.getOrElse(k, (floor2, floor2))
        k -> (c1 + c2, e1 + e2)
      }.toMap
      if (combined.size <= m) combined
      else combined.toSeq
        .sortBy { case (k, (c, _)) => (-c, k) }
        .take(m).toMap
    }

    override def finish(b: Buf): Seq[Entry] =
      b.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
        .map { case (k, (c, e)) => Entry(k, c, e) }

    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder()
  }

  /** The summary as (term, cnt, err) rows. */
  def sketchTopK(df: DataFrame, value: Column, m: Int): DataFrame = {
    val f = udaf(new SpaceSaving(m))
    df.select(f(value).as("s"))
      .select(explode(col("s")).as("entry"))
      .select(col("entry.term").as("term"), col("entry.cnt").as("cnt"),
        col("entry.err").as("err"))
  }
}
