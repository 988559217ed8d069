package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity join on edit distance, scalable: deletion-neighborhood
  * blocking (the FastSS scheme) + exact Levenshtein verification.
  *
  * For edit distance ≤ 1 the blocking is ''complete'': if
  * `lev(a, b) <= 1` then the deletion neighborhoods
  * `D(x) = {x} ∪ {x minus one character}` intersect —
  * substitution at `i` makes `del_i(a) = del_i(b)`, an insertion
  * makes one string a member of the other's deletion set, and equal
  * strings share themselves. The converse does not hold (two
  * different deletions can meet at distance 2), so every candidate
  * pair is re-checked with the exact `levenshtein` — false positives
  * cost time, never correctness.
  *
  * Scale shape: each side expands to `len + 1` blocking keys (HOF
  * `transform`/`sequence`, fully codegen'd — no UDFs), keys are
  * compressed to 64-bit `xxhash64` before the shuffle (a hash
  * collision only adds a candidate, which verification removes), and
  * the only wide operation is one equi-join on the key hash. No
  * all-pairs comparison anywhere: at 100 TB the cost is
  * O(total chars) expansion + one shuffle, versus the quadratic
  * cross-join a naive edit-distance join needs.
  *
  * Skew note: a key shared by `f` left rows and `g` right rows emits
  * `f·g` candidates — the classic blocking skew. For natural-language
  * tokens the hot keys are short strings; `maxBucket` caps the
  * per-key bucket on each side (drop-oversized semantics, off by
  * default so the default join is exact).
  */
object FuzzyJoin {

  /** Array of blocking keys for edit-distance-1 joins: the string
    * itself plus every single-character deletion. Pure Spark HOFs. */
  def deletionKeys(s: Column): Column = {
    val dels = transform(
      sequence(lit(1), length(s)),
      i => concat(substring(s, lit(1), i - 1), s.substr(i + 1, length(s))))
    array_union(array(s), dels)
  }

  /** Depth-`k` deletion neighborhood (k ∈ {1, 2}): every string
    * reachable by deleting at most `k` characters. If
    * `lev(a, b) <= k` then the depth-k neighborhoods intersect
    * (align any ≤k-edit script; deleting the edited positions from
    * both sides meets at the common subsequence) — so blocking on
    * these keys is complete for distance ≤ k. Key count is
    * `1 + n` for k = 1 and `+ n(n−1)/2` for k = 2 — the classic
    * FastSS space/shuffle trade for the wider radius. */
  def deletionKeysK(s: Column, k: Int): Column = {
    require(k == 1 || k == 2, s"supported radii: 1, 2 (got $k)")
    val d1 = deletionKeys(s)
    if (k == 1) d1
    else {
      val n = length(s)
      val pairs = when(n >= 2,
        flatten(transform(sequence(lit(1), n - 1), i =>
          transform(sequence(i + 1, n), j =>
            concat(substring(s, lit(1), i - 1),
              s.substr(i + 1, j - i - 1),
              s.substr(j + 1, n - j))))))
        .otherwise(array().cast("array<string>"))
      array_distinct(concat(d1, pairs))
    }
  }

  /** Edit-distance-≤k join (k ∈ {1, 2}) between `left(idL, strL)`
    * and `right(idR, strR)`. Returns `(idL, strL, idR, strR, dist)`,
    * exact and complete (FastSS completeness for the given radius).
    *
    * @param maxBucket if > 0, drop blocking buckets larger than this
    *                  on either side (explicit recall/skew trade;
    *                  0 = exact join). */
  def levJoin(left: DataFrame, idL: String, strL: String,
              right: DataFrame, idR: String, strR: String,
              k: Int, maxBucket: Int = 0): DataFrame = {
    // the (usually larger) right side travels as (id, keyhash) ONLY —
    // at radius 2 a corpus row emits O(len²/2) keys, so shuffle fat is
    // the dominant cost; the string rejoins by id after candidate
    // dedup, when the pair set is small again
    def keyed(df: DataFrame, id: String, s: String,
              keep: Seq[Column], side: String): DataFrame = {
      // native codegen'd variant hashing (graft_del_hashes) — the HOF
      // deletionKeysK + xxhash64 form is the spec, interpreted and
      // string-allocating; the native form emits the same hashes
      // (seed 42, parity-spec'd) without materializing variants
      val kd = df.select((keep :+
          explode(graft.plans.GraftExtensions.nativeFn(
            "graft_del_hashes", col(s), lit(k))).as("__kh")): _*)
      if (maxBucket <= 0) kd
      else {
        // cap per-key fan-out: count per (key, side), keep small buckets
        val counts = kd.groupBy("__kh")
          .agg(count(lit(1)).as(s"__c_$side"))
          .filter(col(s"__c_$side") <= maxBucket)
        kd.join(counts, Seq("__kh"), "left_semi")
      }
    }
    val l = keyed(left, idL, strL, Seq(col(idL), col(strL)), "l")
    val r = keyed(right, idR, strR, Seq(col(idR)), "r")
    l.join(r, Seq("__kh"))
      .select(col(idL), col(strL), col(idR))
      .distinct() // a pair can share several deletion keys
      .join(right.select(col(idR), col(strR)), idR)
      .withColumn("dist", levenshtein(col(strL), col(strR)))
      .filter(col("dist") <= k)
      .select(col(idL), col(strL), col(idR), col(strR), col("dist"))
  }

  /** Edit-distance-≤1 join — the common radius, kept as the named
    * entry point. */
  def lev1Join(left: DataFrame, idL: String, strL: String,
               right: DataFrame, idR: String, strR: String,
               maxBucket: Int = 0): DataFrame =
    levJoin(left, idL, strL, right, idR, strR, k = 1, maxBucket)
}
