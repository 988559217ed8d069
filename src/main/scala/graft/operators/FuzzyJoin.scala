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

  /** Edit-distance-≤1 join between `left(idL, strL)` and
    * `right(idR, strR)`. Returns `(idL, strL, idR, strR, dist)`,
    * exact and complete (FastSS completeness for k = 1).
    *
    * @param maxBucket if > 0, drop blocking buckets larger than this
    *                  on either side (explicit recall/skew trade;
    *                  0 = exact join). */
  def lev1Join(left: DataFrame, idL: String, strL: String,
               right: DataFrame, idR: String, strR: String,
               maxBucket: Int = 0): DataFrame = {
    def keyed(df: DataFrame, id: String, s: String, side: String): DataFrame = {
      val k = df.select(col(id), col(s),
          explode(deletionKeys(col(s))).as("__key"))
        .select(col(id), col(s), xxhash64(col("__key")).as("__kh"))
      if (maxBucket <= 0) k
      else {
        // cap per-key fan-out: count per (key, side), keep small buckets
        val counts = k.groupBy("__kh")
          .agg(count(lit(1)).as(s"__c_$side"))
          .filter(col(s"__c_$side") <= maxBucket)
        k.join(counts, Seq("__kh"), "left_semi")
      }
    }
    val l = keyed(left, idL, strL, "l")
    val r = keyed(right, idR, strR, "r")
    l.join(r, Seq("__kh"))
      .select(col(idL), col(strL), col(idR), col(strR))
      .distinct() // a pair can share several deletion keys
      .withColumn("dist", levenshtein(col(strL), col(strR)))
      .filter(col("dist") <= 1)
  }
}
