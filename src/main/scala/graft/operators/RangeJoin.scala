package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable point-in-range joins (the GeoIP lookup shape, SURVEY §2.3
  * J2): `fact.key BETWEEN dim.start AND dim.end` over a dim of DISJOINT
  * long ranges.
  *
  * A plain `between` join can only plan as BroadcastNestedLoopJoin —
  * every fact row is tested against EVERY dim range, O(rows × ranges).
  * Fine for a handful of ranges; catastrophic for a real MaxMind dim
  * (~3M ranges) at 100 TB of fact rows. [[bucketed]] turns it into an
  * equi-join: ranges explode into the fixed-width buckets they overlap
  * and the fact side joins on its key's bucket, so each row is tested
  * against only the ranges sharing its bucket (BroadcastHashJoin /
  * shuffle hash join — Catalyst's choice), then the `between` filter
  * keeps the true match.
  *
  * Bucket width is a bits parameter (bucket = key >> bits). Narrow
  * buckets multiply dim rows (a range spanning the whole key space
  * explodes into span/2^bits rows); wide buckets put many ranges in one
  * bucket. For IPv4 CIDR-shaped dims, 16 bits (= /16 blocks) keeps the
  * explosion factor near 1 while bounding per-bucket candidates.
  */
object RangeJoin {

  /** Left equi-bucket range join. `dim` must have disjoint
    * [startCol, endCol] ranges (inclusive); each fact row gets at most
    * one match, so the left join emits exactly one row per fact row —
    * identical output to `fact.join(dim, key between(start, end),
    * "left")` over ANY signed long domain (buckets derive from the
    * ARITHMETIC shift, which is monotonic over signed longs, so a range
    * straddling zero still explodes into an ascending bucket list and
    * negative keys land in the same buckets as the ranges covering
    * them). The exploded dim stays broadcast-size for real-world range
    * dims; pass a larger `bits` if a pathological dim explodes. */
  def bucketed(fact: DataFrame, dim: DataFrame, keyCol: Column,
               startCol: String, endCol: String,
               bits: Int = 16): DataFrame = {
    require(bits >= 0 && bits < 63, s"bits must be in [0, 63), got $bits")
    fact
      .join(broadcast(explodeBuckets(dim, startCol, endCol, bits)),
        shiftright(keyCol, bits) === col("__bucket") &&
          keyCol.between(col(startCol), col(endCol)),
        "left")
      .drop("__bucket")
  }

  private def explodeBuckets(dim: DataFrame, startCol: String,
                             endCol: String, bits: Int): DataFrame =
    dim.withColumn("__bucket",
      explode(sequence(
        shiftright(col(startCol), bits),
        shiftright(col(endCol), bits))))

  /** Left range join over ranges that MAY overlap (nested CIDRs from a
    * real mmdb export): each fact row keeps only the MOST SPECIFIC
    * match — the smallest span, i.e. the longest prefix for CIDR dims —
    * with (start desc) as the deterministic tie-break between
    * equal-span matches. Unmatched fact rows survive with null dim
    * columns, exactly like [[bucketed]]. */
  def bucketedMostSpecific(fact: DataFrame, dim: DataFrame, keyCol: Column,
                           startCol: String, endCol: String,
                           bits: Int = 16): DataFrame = {
    require(bits >= 0 && bits < 63, s"bits must be in [0, 63), got $bits")
    import org.apache.spark.sql.expressions.Window
    val tagged = fact.withColumn("__rid", monotonically_increasing_id())
    val joined = tagged
      .join(broadcast(explodeBuckets(dim, startCol, endCol, bits)),
        shiftright(keyCol, bits) === col("__bucket") &&
          keyCol.between(col(startCol), col(endCol)),
        "left")
      .drop("__bucket")
    val w = Window.partitionBy(col("__rid")).orderBy(
      (col(endCol) - col(startCol)).asc_nulls_last, col(startCol).desc)
    joined.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") === 1)
      .drop("__rank", "__rid")
  }
}
