package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

/** Bloom-prefiltered anti join — the 100 TB shape of "which keys are
  * NEW relative to a huge history" (the reference's 25-day ingest
  * dedup, ref `README.md` history tables, at cluster scale).
  *
  * A plain left-anti join shuffles BOTH sides on the key. With a
  * Bloom filter over the history keys:
  *   - rows the filter rejects are DEFINITELY new (no false
  *     negatives) — they skip the join entirely: no shuffle, no
  *     history scan;
  *   - only the `fpp` false-positive sliver plus the true duplicates
  *     run the exact anti join, and the history side of that join is
  *     itself pre-filtered by a second bloom built over the (small)
  *     candidate key set, so the exact join is tiny-vs-small instead
  *     of big-vs-big.
  * Either bloom can only ADD candidates/history rows, never drop a
  * real match, so the result is row-identical to the plain anti join
  * — the spec asserts parity and the oracle is the plain form.
  *
  * The aggregate is Spark's own runtime-filter sketch
  * (`BloomFilterAggregate`): partials merge executor-side and the
  * driver holds ONE blob, like a broadcast hash table but ~100x
  * denser (9.6 bits/key at 1% fpp; 1e8 history keys ≈ 115 MB).
  * `expectedItems`/`fpp` are caller policy per sketch semantics.
  */
object BloomJoin {

  private def fn(name: String, args: Column*): Column = {
    GraftExtensions.install(SparkSession.active)
    call_function(name, args: _*)
  }

  /** Optimal bit count for a target false-positive rate — the
    * standard `-n ln p / (ln 2)^2`. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    math.ceil(-expectedItems.toDouble * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
  }

  /** Serialized bloom filter of a key column; null when `df` has no
    * non-null keys. */
  def bloomOf(df: DataFrame, key: Column, expectedItems: Long,
              fpp: Double = 0.01): Array[Byte] =
    df.agg(fn("graft_bloom_agg", key, lit(expectedItems),
        lit(optimalNumBits(expectedItems, fpp))))
      .head.getAs[Array[Byte]](0)

  /** Codegen'd membership probe of `key` against a literal blob. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    fn("graft_might_contain", lit(bloom), key)

  /** All rows of `df` whose `keyName` does not appear in
    * `history(hkeyName)` — row-identical to the plain
    * `left_anti` USING-join (null keys match nothing, so they are
    * kept, as in SQL). Name-based keys + a USING join keep the exact
    * phase unambiguous even when both frames share lineage (the
    * today-vs-history self-join shape). */
  def antiJoinBloom(df: DataFrame, keyName: String,
                    history: DataFrame, hkeyName: String,
                    expectedHistoryItems: Long,
                    expectedCandidateItems: Long,
                    fpp: Double = 0.01): DataFrame = {
    val historyBloom =
      bloomOf(history, col(hkeyName), expectedHistoryItems, fpp)
    if (historyBloom == null) return df // empty history: all rows new
    val key = col(keyName)
    val definitelyNew =
      df.filter(key.isNull || !mightContain(historyBloom, key))
    val candidates =
      df.filter(key.isNotNull && mightContain(historyBloom, key))
    val relevantHistory =
      Option(bloomOf(candidates, key, expectedCandidateItems, fpp))
        .map(b => history.filter(mightContain(b, col(hkeyName))))
        .getOrElse(history.limit(0))
    definitelyNew.unionAll(
      candidates.join(
        relevantHistory.select(col(hkeyName).as(keyName)),
        Seq(keyName), "left_anti"))
  }
}
