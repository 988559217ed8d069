package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Correctness burden for the HLL sketch tier (no DuckDB oracle can
  * replay DataSketches registers — q_rolling_distinct_approx is
  * rows-only at the driver, so these specs ARE the gate):
  *  1. composability is EXACT equality, not closeness: union of
  *     per-period sketches has identical registers to one sketch of
  *     the unioned rows, so re-windowing from saved blobs gives the
  *     SAME estimate as sketching each window from raw events;
  *  2. estimates sit inside the published error envelope of the
  *     EXACT bitmap twin on identical input;
  *  3. contract parity with the exact twin: NULL ids dropped, gap
  *     periods not emitted, w = 1 degenerates to per-period counts. */
class SketchOpsSpec extends SparkTestBase {

  import spark.implicits._

  // 40 periods with duplicates, overlaps, and two calendar gaps;
  // ~1.2k distinct ids per 7-period window
  lazy val rows = {
    val rnd = new scala.util.Random(17)
    (for {
      p <- (1 to 45).filterNot(p => p == 13 || p == 29)
      _ <- 1 to 400
    } yield (p.toLong, (rnd.nextInt(3000) + p * 17).toLong))
      .toDF("p", "id")
  }

  test("the union path is EXACTLY partition-invariant: same result " +
      "from any input partitioning and from FINER pre-sketching " +
      "(register-max union is associative/commutative)") {
    val base = SketchOps.rollingDistinctApprox(rows, $"p", $"id", 7)
      .as[(Long, Long)].collect().toMap
    // input partitioning must not matter (different partial-agg merge
    // trees, same registers)
    val repart = SketchOps
      .rollingDistinctApprox(rows.repartition(37, $"id"), $"p", $"id", 7)
      .as[(Long, Long)].collect().toMap
    assert(repart === base)
    // FINER pre-sketching: per-(period, id%3) blobs unioned up to
    // per-period, then windowed — the saved-blob re-aggregation path
    val fine = rows
      .groupBy($"p", ($"id" % 3).as("s"))
      .agg(hll_sketch_agg($"id", lit(12)).as("sk"))
      .groupBy($"p").agg(hll_union_agg($"sk", lit(false)).as("sk"))
    val present = fine.select($"p".as("period"))
    val viaFiner = fine
      .withColumn("period", explode(expr("sequence(p, p + 6L)")))
      .groupBy("period")
      .agg(hll_sketch_estimate(hll_union_agg($"sk", lit(false)))
        .as("n"))
      .join(broadcast(present), Seq("period"), "left_semi")
      .as[(Long, Long)].collect().toMap
    assert(viaFiner === base)
  }

  test("blob path sits within a fraction of the error envelope of a " +
      "DIRECT per-window sketch — the documented HIP-vs-composite " +
      "asymmetry (union drops the HIP accumulator)") {
    val viaBlobs = SketchOps.rollingDistinctApprox(rows, $"p", $"id", 3)
      .as[(Long, Long)].collect().toMap
    val periods = rows.select($"p").distinct().as[Long].collect()
    for (per <- periods) {
      val direct = rows.filter($"p" >= per - 2 && $"p" <= per)
        .agg(hll_sketch_estimate(hll_sketch_agg($"id", lit(12))))
        .head().getLong(0)
      val blob = viaBlobs(per).toDouble
      assert(math.abs(blob - direct) <= math.max(2.0, 0.02 * direct),
        s"period $per: blob $blob vs direct $direct")
    }
  }

  test("estimates land inside the error envelope of the EXACT bitmap " +
      "twin on identical input (lgK=12 -> rse ~1.6%; assert 5% ~ 3 sigma)") {
    val exact = BitmapOps.rollingDistinct(rows, $"p", $"id", 7)
      .as[(Long, Long)].collect().toMap
    val approx = SketchOps.rollingDistinctApprox(rows, $"p", $"id", 7)
      .as[(Long, Long)].collect().toMap
    assert(approx.keySet === exact.keySet,
      "same emitted periods (gaps included/excluded identically)")
    for ((per, ex) <- exact) {
      val ap = approx(per).toDouble
      assert(math.abs(ap - ex) <= 0.05 * ex,
        s"period $per: approx $ap vs exact $ex")
    }
  }

  test("NULL ids are excluded and null periods dropped — the bitmap " +
      "contract; sketch size stays bounded by lgK") {
    val withNulls = Seq(
      (Some(1L), Some(10L)), (Some(1L), None), (None, Some(99L)),
      (Some(1L), Some(11L)), (Some(1L), Some(10L))
    ).toDF("p", "id")
    val out = SketchOps.rollingDistinctApprox(withNulls, $"p", $"id", 1)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L))
    // blob stays small at any cardinality: one period, 50k ids
    val big = spark.range(50000).select(lit(1L).as("p"), $"id")
    val blob = SketchOps.segmentSketches(big, $"p", $"id")
      .select(length($"sk")).head().getInt(0)
    assert(blob <= (1 << 12) * 2,
      s"sketch blob $blob B must stay ~2^lgK-bounded")
  }
}
