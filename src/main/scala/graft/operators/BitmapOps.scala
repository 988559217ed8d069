package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** Exact audience/segment overlap by bitmap set algebra — the
  * ClickHouse `groupBitmap` / `bitmapAndCardinality` shape
  * (reference-adjacent: misc/clickhouse_queries.md's distinct
  * aggregations are the 1-set special case). "How many users did
  * segments A and B share?" for every segment pair, computed as
  * popcounts over bucketed bitsets instead of a count-distinct
  * self-join.
  *
  * Scale shape, in order:
  *  1. one scan splits `id` into `(bucket = id div 2^16,
  *     offset = id mod 2^16)` — exact for negative ids too;
  *  2. `groupBy(segment, bucket)` aggregates `graft_bitmap_agg(offset)`
  *     — a TypedImperativeAggregate whose partial merge is a bitwise
  *     OR, so DUPLICATE ids die in the map-side combine and one
  *     shuffle row is one (segment, bucket, ≤8 KiB blob) no matter
  *     how many events fed it. A count-distinct formulation ships
  *     every distinct (segment, id) pair through an Expand + two
  *     shuffles; at 100 TB the bitmap frame is
  *     segments × idSpace/65536 rows — for 10^10 ids that is ~150k
  *     buckets/segment × 8 KiB ≈ 1.2 GiB per segment, spread across
  *     the cluster;
  *  3. the pair intersection is a bucket-confined self-join (equi-join
  *     on `bucket`, `seg_a < seg_b`) summing codegen'd
  *     `graft_bitmap_and_count` popcounts — never an id-level join;
  *  4. per-segment sizes fold in as a broadcast (segments are few).
  *
  * Output is exact integers end-to-end: `n_common`, `n_a`, `n_b`, and
  * `jaccard_ppm = (10^6 · n_common) div (n_a + n_b − n_common)` —
  * parts-per-million kept integral so cross-engine float rounding can
  * never flip the gate. Pairs with zero overlap are omitted (matching
  * the inner-join oracle form). */
object BitmapOps {

  private def native(fn: String, args: Column*): Column =
    GraftExtensions.nativeFn(fn, args: _*)

  /** The (seg, bucket, bm) bitmap frame the operators below build on —
    * also exposed so measurement harnesses can probe the WIRE cost
    * (`length(bm)`) of the adaptive sparse/dense encoding directly
    * (the Scale100 id-space leg and PERF.md's memory row read it).
    *
    * NULL ids are EXCLUDED up front (explicit `isNotNull` filter): a
    * bitmap has no slot for "unknown member", and without the filter
    * NULLs would silently vanish from the bitmaps (skipped by the
    * aggregate, never equi-joined) while a DISTINCT-self-join oracle
    * counts NULL as one distinct member per segment — diverging sizes
    * and ratios on nullable id columns. Every oracle form over these
    * operators therefore carries `WHERE id IS NOT NULL`.
    *
    * NON-CASTABLE ids FAIL LOUDLY (ADVICE r13): `cast('long')` turns a
    * non-numeric string id into NULL, which the filter above would
    * then silently drop — a member vanishing from every count with no
    * signal. A per-row guard (input non-null ⇒ cast non-null) rides
    * the id expression itself, so a `"user-42"` id fails the job with
    * the remedy (map ids to integers first — `dense_rank`/`hash` or a
    * dimension join) instead of under-counting. Under ANSI mode
    * (Spark 4's default) the cast throws Spark's own CAST_INVALID_INPUT
    * first — also loud; the guard closes the silent-drop hole in
    * non-ANSI sessions and carries the graft-specific remedy. */
  def segmentBitmaps(df: DataFrame, seg: Column, id: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // bucket = floor(id / 2^16) in EXACT integer arithmetic for the
    // full long range (a double division is only exact to 2^53):
    // id − pmod is a multiple of the width, so truncating `div`
    // equals floor even for negative ids.
    //
    // The cast guard: assert_true yields NULL when the row passes, so
    // coalesce(guard, cast) IS the cast — riding the only column every
    // downstream consumer (bucket AND offset) derives from, where no
    // projection can prune it.
    df.select(seg.as("seg"),
        coalesce(
          assert_true(id.isNull || id.cast("long").isNotNull,
            concat(lit("segmentBitmaps: id value '"), id.cast("string"),
              lit("' is not castable to BIGINT — bitmap ids must be " +
                "integral; map non-numeric ids to integers first " +
                "(dense_rank over the id dimension, or a surrogate-key " +
                "join)"))).cast("long"),
          id.cast("long")).as("__id"))
      .where($"__id".isNotNull)
      .select(col("seg"),
        expr(s"(__id - pmod(__id, $BucketWidth)) div $BucketWidth")
          .as("bucket"),
        pmod(col("__id"), lit(BucketWidth)).cast("int").as("off"))
      .groupBy("seg", "bucket")
      .agg(native("graft_bitmap_agg", $"off").as("bm"))
  }

  /** Pairwise exact overlap of the distinct `id` sets per `seg`.
    * Columns: seg_a, seg_b (seg_a < seg_b), n_common, n_a, n_b,
    * jaccard_ppm (integral parts-per-million — cross-engine-stable). */
  def segmentOverlap(df: DataFrame, seg: Column, id: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val maps = segmentBitmaps(df, seg, id)
    val sizes = maps.groupBy("seg")
      .agg(sum(native("graft_bitmap_count", $"bm")).as("n"))
    val a = maps.select($"seg".as("seg_a"), $"bucket", $"bm".as("bm_a"))
    val b = maps.select($"seg".as("seg_b"), $"bucket", $"bm".as("bm_b"))
    a.join(b, Seq("bucket"))
      .where($"seg_a" < $"seg_b")
      .groupBy("seg_a", "seg_b")
      .agg(sum(native("graft_bitmap_and_count", $"bm_a", $"bm_b"))
        .as("n_common"))
      .where($"n_common" > 0)
      .join(broadcast(sizes.select($"seg".as("seg_a"), $"n".as("n_a"))),
        Seq("seg_a"))
      .join(broadcast(sizes.select($"seg".as("seg_b"), $"n".as("n_b"))),
        Seq("seg_b"))
      .select($"seg_a", $"seg_b", $"n_common", $"n_a", $"n_b",
        expr("(1000000 * n_common) div (n_a + n_b - n_common)")
          .as("jaccard_ppm"))
  }

  /** Rolling-window EXACT distinct counts — "7-day rolling uniques",
    * the classic OLAP ask whose naive forms both explode at scale: a
    * per-window re-aggregation re-reads `window` periods of raw
    * events per output period (window× the fact I/O), and a
    * count-distinct over an exploded (period × offsets) frame ships
    * every (window-period, id) pair through an Expand shuffle. Here
    * the fact table is touched ONCE ([[segmentBitmaps]] with the
    * period as the segment: per-(period, bucket) blobs, duplicates
    * dead map-side), and the window fan-out rides the BOUNDED bitmap
    * frame — `periods × idSpace/65536` rows of ≤ 8 KiB, each
    * replicated `window` times into the trailing windows it serves
    * and union-merged by `graft_bitmap_or_agg` (the OR-of-ORs is the
    * same idempotent merge, so the second aggregate also combines
    * map-side). At 10^10 ids × 365 days × window 28 the fanned frame
    * is ~1.5 TB spread across the cluster — vs 28× a 100 TB scan.
    *
    * Output: (period, n_distinct) — distinct `id`s observed in the
    * TRAILING window `[period − window + 1, period]`, one row per
    * period PRESENT in the input (gap periods are not emitted,
    * matching the DISTINCT-periods oracle form). NULL ids excluded as
    * in [[segmentOverlap]]. `window = 1` degenerates to per-period
    * distinct counts. */
  def rollingDistinct(df: DataFrame, period: Column, id: Column,
                      window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val daily = segmentBitmaps(df, period.cast("long"), id)
      .withColumnRenamed("seg", "p")
      // ONE event scan, enforced: both consumers below (the observed-
      // period set and the window fan-out) read these blocks. Without
      // the cut, column pruning drops `bm` from the period-set
      // subtree's aggregate, the two exchanges stop being canonically
      // equal, ReuseExchange misses, and the events table is scanned
      // twice (caught by the r13 plan review; PlanSpec pins <= 1 scan)
      .localCheckpoint(false)
    val present = daily.select($"p".as("period")).distinct()
    daily
      // each (p, bucket, bm) serves the trailing windows ending at
      // p .. p + window - 1; the explode fans BLOBS, not events
      .withColumn("period", explode(expr(
        s"sequence(p, p + ${window - 1}L)")))
      .groupBy("period", "bucket")
      .agg(native("graft_bitmap_or_agg", $"bm").as("bm"))
      .groupBy("period")
      .agg(sum(native("graft_bitmap_count", $"bm")).as("n_distinct"))
      // emit only observed periods (drops the max(p)+k tail and any
      // calendar gaps) — a broadcast semi-join on the tiny period set
      .join(broadcast(present), Seq("period"), "left_semi")
      .select($"period", $"n_distinct")
  }

  /** Ids per bitmap bucket — one 8 KiB dense bitset. */
  val BucketWidth: Int = graft.plans.BitmapCode.Width
}
