package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via global-frequency prefix
  * filtering — the AllPairs / PPJoin family (Bayardo et al., WWW'07;
  * Xiao et al., WWW'08). The guaranteed-recall counterpart to the
  * MinHash-LSH candidates in [[Dedup]]: LSH trades a tunable miss
  * probability for constant candidate work; prefix filtering is
  * EXACT — the output provably equals the brute-force
  * `Jaccard >= t` join — while still never materializing all pairs.
  *
  * Why it scales: order every token set by ascending global document
  * frequency (rarest first; ties by token). For `Jaccard(A,B) >= t`
  * the overlap is `I >= t·max(|A|,|B|)`, and since the sets are
  * sorted consistently the FIRST common token sits within the first
  * `|X| - ceil(t·|X|) + 1` tokens of BOTH sets. So it suffices to
  * index only that prefix of each set and join prefixes on token.
  * The prefix holds each set's RAREST tokens, so bucket sizes are
  * governed by the df of rare tokens, not of stopwords — that
  * ordering IS the skew defense (a stopword never lands in a prefix
  * unless a set is almost entirely stopwords). Candidate pairs then
  * pass a length filter (`t·max <= min` — a Jaccard necessary
  * condition on sizes alone) before one exact verification per
  * distinct pair.
  *
  * Shuffle shape (100 TB): df-count groupBy on token; the ordered-set
  * rebuild (explode + join + groupBy id); the prefix join shipping
  * only `(token, id, n)` rows; two id-equi-joins to fetch the full
  * arrays for the pruned candidates. No stage ever carries a payload
  * bigger than (set × small prefix multiplicity), and the quadratic
  * step runs only inside rare-token buckets.
  *
  * Threshold exactness: `t` is snapped DOWN to `tNum/10^6` for the
  * integer prefix/length arithmetic (`p = n - ceil(t'·n) + 1`
  * computed with exact integer ceil). `t' <= t` can only LENGTHEN
  * prefixes and WEAKEN the length filter — a superset of candidates,
  * never a miss — while the final verification applies the caller's
  * exact `t` on the exact intersection/union ratio.
  */
object SimilarityJoin {

  /** All pairs `(id_a < id_b)` with set-Jaccard of `tokens` >= `threshold`,
    * plus the exact `jaccard` value. `tokens` is deduplicated here;
    * rows with empty token sets produce no pairs (Jaccard vs anything
    * is 0 < threshold by the `threshold > 0` contract). */
  def prefixJaccardSelfJoin(df: DataFrame, idCol: String, tokens: Column,
                            threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val tNum: Long = math.floor(threshold * 1000000d).toLong

    val sets = df.select(col(idCol).as("id"),
      array_distinct(tokens).as("toks"))

    // Global token order: (document frequency asc, token asc) — a total
    // order both sides of every pair agree on.
    val freq = sets.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))

    // ONE materialization of the ordered-set rebuild (r21, guide
    // §5/§3.3): `ordered` feeds three consumers — the prefix index and
    // both candidate-fetch joins — and without a cut each consumer
    // re-ran the whole explode + df-join + collect_list subtree (the
    // r21 before-plan shows the subtree triplicated: 50 Exchanges).
    // A LAZY local checkpoint computes it once; the repo-standard
    // fault-tolerance caveat applies (executor loss re-runs the job —
    // see QueryOps.FunnelScan), and the blocks are (id, ordered
    // tokens)-sized, the same order as the input sets.
    val ordered = sets
      .select(col("id"), explode(col("toks")).as("tok"))
      .join(freq, "tok")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("tok"))))
        .as("__o"))
      .select(col("id"),
        transform(col("__o"), e => e("tok")).as("otoks"))
      .localCheckpoint(false)

    // p = n - ceil(t'·n) + 1, integer-exact ceil; always >= 1 for n >= 1.
    // posexplode keeps each prefix token's 0-based POSITION in the
    // ordered set — the PPJoin positional filter's input (r21).
    val pref = ordered
      .withColumn("n", size(col("otoks")).cast("long"))
      .withColumn("p",
        col("n") - expr(s"(n * $tNum + 999999) div 1000000") + lit(1L))
      .select(col("id"), col("n"),
        posexplode(slice(col("otoks"), lit(1), col("p").cast("int"))))
      .toDF("id", "n", "pos", "tok")

    // PPJoin POSITIONAL filter (Xiao et al., WWW'08), exactness-safe:
    // Jaccard(A,B) >= t  ⇔  overlap I >= t/(1+t)·(|A|+|B|), and all
    // common tokens sit at or after the pair's FIRST common token in
    // the shared global order — so I <= min(|A| - i₁, |B| - j₁) where
    // (i₁, j₁) are that token's 0-based positions. Both sides order
    // consistently, so the matched prefix row minimizing i also
    // minimizes j: per-pair min(pos) on each side IS the first common
    // token, and the groupBy subsumes the old distinct() while the
    // bound prunes candidates the length filter alone admits. Snapped
    // t' = tNum/10⁶ <= t only weakens the bound (superset, never a
    // miss); the exact verification below still applies the caller's
    // t. Integer form of ubound >= ceil(tNum·(nₐ+n_b)/(10⁶+tNum)):
    // ubound·(10⁶+tNum) >= tNum·(nₐ+n_b).
    val cand = pref.select(col("tok"), col("id").as("id_a"),
        col("n").as("n_a"), col("pos").as("pa"))
      .join(pref.select(col("tok"), col("id").as("id_b"),
        col("n").as("n_b"), col("pos").as("pb")), "tok")
      .filter(col("id_a") < col("id_b"))
      // Jaccard >= t  ⇒  t·max(|A|,|B|) <= min(|A|,|B|)
      .filter(greatest(col("n_a"), col("n_b")) * tNum
        <= least(col("n_a"), col("n_b")) * 1000000L)
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(min("pa").as("__i1"), min("pb").as("__j1"))
      .filter(least(col("n_a") - col("__i1"), col("n_b") - col("__j1"))
        * (1000000L + tNum) >= (col("n_a") + col("n_b")) * tNum)
      .select("id_a", "id_b")

    cand
      .join(ordered.select(col("id").as("id_a"), col("otoks").as("__ta")),
        "id_a")
      .join(ordered.select(col("id").as("id_b"), col("otoks").as("__tb")),
        "id_b")
      .withColumn("jaccard", Dedup.jaccard(col("__ta"), col("__tb")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
