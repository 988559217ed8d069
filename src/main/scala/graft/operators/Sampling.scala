package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and corpus-mixing operators for a
  * training-data pipeline. Everything here is content-derived — no
  * `rand()` — so retries, speculative tasks, and re-runs produce the
  * SAME sample, and a second engine (the DuckDB oracle) can recompute
  * the exact row set closed-form.
  *
  * Scale shape: Bernoulli and mixing are scan-level filters (no
  * shuffle); stratified top-n and packing shuffle once on their
  * stratum/shard key. No global windows, no driver-side data.
  */
object Sampling {

  /** Uniform-in-[0,1) deterministic coin for a key: the first 8 hex
    * chars of md5 compared against the rate's hex threshold. Plain
    * STRING comparison on lowercase hex — bit-identical across
    * engines, no integer parsing dialects. */
  private[graft] def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    // clamp to 0 as in [[hexThresholdCol]]: a positive rate < ~2^-33
    // rounds to zero draws, and `%08x` of -1L would render the 16-char
    // "ffffffffffffffff" — ABOVE every 8-char coin, silently selecting
    // ALL rows instead of ~none; threshold "00000000" keeps the
    // effective rate at 2^-32, a superset of any rate that rounds to 0
    if (rate == 0.0) "/" // sorts below every hex digit: selects nothing
    else f"${math.max(0L, math.round(rate * (1L << 32)).min(1L << 32) - 1)}%08x"
  }

  /** md5-hex coin of a key column (cast to string first so the bytes
    * hashed are engine-independent). */
  private[graft] def coin(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 8)

  /** Deterministic Bernoulli sample: keeps a row iff
    * md5(key)[0,8) <= threshold(rate). Content-derived — stable under
    * retries and recomputable by any engine. */
  def bernoulli(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(coin(key) <= lit(hexThreshold(rate)))

  /** Column form of [[hexThreshold]] for a rate COLUMN; rates <= 0
    * select nothing, rates >= 1 select everything. A positive rate so
    * small it rounds to zero (< ~2^-33, i.e. a stratum past ~2*10^11
    * rows at the default draws) clamps to threshold 0 — effective
    * rate 2^-32, which is >= any rate that rounds to zero, so the
    * pre-filter stays a superset of the requested draw instead of
    * degenerating: without the clamp, `%08x` of -1L renders the
    * 16-char "ffffffffffffffff", which compares above every 8-char
    * coin and silently selects ALL rows. */
  private[graft] def hexThresholdCol(rate: Column): Column =
    when(rate <= 0.0, lit("/"))
      .when(rate >= 1.0, lit("ffffffff"))
      .otherwise(format_string("%08x",
        greatest(lit(0L), (round(rate * 4294967296.0) - 1).cast("long"))))

  /** Deterministic stratified sample: the `n` rows of each stratum
    * with the smallest md5 coin (id as tie-break) — a uniform-without-
    * replacement draw per group, same rows every run.
    *
    * Scale shape (r15 — replaces a full-corpus window shuffle): the
    * md5 coins are uniform over the id space, so the n-th smallest
    * coin of an m-row stratum concentrates at n/m. Pass 1 counts each
    * stratum (map-side combined); pass 2 keeps only rows whose coin
    * is under the OVERSAMPLED per-stratum cutoff
    * `(oversample·n + floorDraws)/m` — ≈ `oversample·n + floorDraws`
    * survivors per stratum — and the exact top-n window runs on that
    * tiny frame. Exactness: if at least min(n, m) rows of a stratum
    * pass a cutoff T, the n smallest coins are all ≤ T, so the
    * survivor set contains the true sample; an in-plan assert checks
    * exactly that per stratum and fails LOUDLY naming `oversample`
    * when a pathological coin distribution (deterministic for a given
    * dataset) needs a larger factor. One case the assert cannot see:
    * a stratum whose EVERY coin misses the cutoff carries no row for
    * the guard to ride and would vanish silently — the ≥ 25
    * expected-draw parameter floor below bounds that at P ≤ e^-25
    * per stratum (astronomically safe, but probabilistic, not a
    * theorem; the guarded under-capture case IS deterministic). The window form shuffled EVERY row to its stratum — a
    * hot stratum (90% of a crawl in one language) became one
    * un-splittable window partition (the r15 skew audit), and the
    * shuffle itself was corpus-sized where this one is sample-sized.
    * Strata with m ≤ oversample·n + floorDraws pass entirely (rate
    * 1), so small-group semantics are unchanged. The legacy window
    * form stays behind `viaWindow` on the `private[graft]` impl —
    * parity spec only, not public API (flipping it shuffles the whole
    * corpus and single-tasks the hot stratum). */
  def stratifiedN(df: DataFrame, stratum: Column, id: Column,
                  n: Int, oversample: Double = 8.0,
                  floorDraws: Double = 50.0): DataFrame =
    stratifiedNImpl(df, stratum, id, n, oversample, floorDraws,
      viaWindow = false)

  private[graft] def stratifiedNImpl(
      df: DataFrame, stratum: Column, id: Column,
      n: Int, oversample: Double, floorDraws: Double,
      viaWindow: Boolean): DataFrame = {
    require(n > 0, "n must be positive")
    // the in-plan guard below catches any stratum whose cutoff
    // captured ≥ 1 but < min(n, m) rows; a stratum capturing ZERO
    // rows has no row to carry an assert and would vanish silently,
    // so the expected-survivor floor is enforced here instead:
    // ≥ 25 expected draws makes P(zero survivors) ≤ e^-25 per
    // stratum (strata with m below the floor pass whole at rate 1) —
    // unreachable with the md5 coin, by construction rather than by
    // runtime check
    require(viaWindow || oversample * n + floorDraws >= 25.0,
      s"stratifiedN: oversample*n + floorDraws = " +
        s"${oversample * n + floorDraws} < 25 expected survivors — " +
        "a stratum could miss the cutoff entirely and vanish " +
        "silently; raise oversample or floorDraws")
    if (viaWindow)
      df.withColumn("__coin", coin(id))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(stratum).orderBy(col("__coin"), id)))
        .filter(col("__rn") <= n)
        .drop("__coin", "__rn")
    else {
      val counts = df.groupBy(stratum.as("__st"))
        .agg(count(lit(1)).as("__m"))
      val rate = least(lit(1.0),
        (lit(oversample) * n + lit(floorDraws)) / col("__m"))
      val survivors = df.withColumn("__coin", coin(id))
        // the counts frame is stratum-cardinality-sized; in the
        // hot-strata regime this operator de-skews it is tiny and AQE
        // broadcasts it (millions of tiny strata revert to a plain
        // co-partitioned join, where the window form was fine anyway)
        // null-safe: a NULL stratum is a legitimate group in the
        // window form and must stay one here
        .join(counts, stratum <=> col("__st"))
        .filter(col("__coin") <= hexThresholdCol(rate))
      val w = Window.partitionBy(stratum).orderBy(col("__coin"), id)
      survivors
        .withColumn("__rn", row_number().over(w))
        // exactness guard: >= min(n, m) survivors in this stratum ⇔
        // the cutoff captured the true top-n (see scaladoc); riding
        // the same bounded survivor window costs no extra pass
        .withColumn("__ok", coalesce(assert_true(
          count(lit(1)).over(Window.partitionBy(stratum)) >=
            least(lit(n.toLong), col("__m")),
          lit("stratifiedN: the oversampled coin cutoff captured " +
            "fewer than min(n, stratum size) rows for a stratum — " +
            "raise `oversample` (pathological coin clustering)"))
          .cast("long"), lit(0L)))
        .filter(col("__rn") + col("__ok") <= n)
        .drop("__coin", "__rn", "__ok", "__st", "__m")
    }
  }

  /** Corpus mixing: per-source deterministic Bernoulli rates in one
    * scan — the standard training-mixture reweighting (e.g. upsample
    * wiki, downsample crawl). Sources absent from `rates` drop. */
  def mixCorpora(df: DataFrame, source: Column, id: Column,
                 rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty, "rates must not be empty")
    val threshold = rates.foldLeft(lit(null).cast("string")) {
      case (acc, (src, rate)) =>
        when(source === lit(src), lit(hexThreshold(rate))).otherwise(acc)
    }
    df.filter(coin(id) <= threshold)
  }

  /** Deterministic train/val/test split: each row gets the FIRST
    * label whose cumulative-rate threshold its md5 coin clears —
    * the standard hash-split that keeps a document in the same split
    * across reruns, engines, and corpus growth (new rows never move
    * old rows between splits). Scan-level, no shuffle. Rows beyond
    * the cumulative total (when rates sum < 1) are dropped —
    * carve-outs compose with [[bernoulli]] holdouts. */
  def hashSplit(df: DataFrame, key: Column,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "splits must not be empty")
    require(splits.map(_._2).sum <= 1.0 + 1e-9,
      "split rates must sum to <= 1")
    val cum = splits.scanLeft(0.0) { case (acc, (_, r)) => acc + r }.tail
    val c = coin(key)
    val label = splits.zip(cum).reverse.foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), cm)) =>
        when(c <= lit(hexThreshold(cm)), lit(name)).otherwise(acc)
    }
    df.withColumn("split", label).filter(col("split").isNotNull)
  }

  /** LEAKAGE-FREE split: near-duplicate documents must never straddle
    * train and test (a test doc whose near-dup sits in train is
    * memorized, not generalized — the contamination mode group-aware
    * splits exist to kill). The coin is thrown for the near-dup
    * CLUSTER representative, not the document: `clusters` is an
    * (id, cluster) frame from [[Dedup.nearDupClusters]] (cluster =
    * min-id of the connected component); documents in no near-dup
    * pair are their own representative. A whole near-dup family
    * therefore moves between splits as one unit, under the same
    * stable-under-growth md5 coin as [[hashSplit]].
    *
    * Scale: one equi-join on id (clusters holds only documents that
    * appear in some near-dup pair — a small fraction of the corpus;
    * AQE broadcasts it when it fits), then the scan-level split
    * labeling. Output adds (cluster, split). */
  def leakFreeSplit(df: DataFrame, key: Column, clusters: DataFrame,
                    splits: Seq[(String, Double)]): DataFrame = {
    val rep = df
      .join(clusters.select(col("id").as("__id"), col("cluster")),
        key === col("__id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), key.cast("long")))
      .drop("__id")
    hashSplit(rep, col("cluster"), splits)
  }

  /** Deterministic global shuffle into `numShards` output shards: the
    * md5 of (seed, key) assigns the shard from its first 24 bits and
    * the within-shard order from the next 32 (decorrelated by
    * construction), `key` breaking ties. This is the corpus-shuffle
    * step before sequence packing: one hash-partitioned exchange, a
    * per-shard sort, no global window anywhere. Reshuffling is a seed
    * change, not a new data path. */
  def shuffleShards(df: DataFrame, key: Column, numShards: Int,
                    seed: String): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val h = md5(concat(lit(seed), key.cast("string")).cast("binary"))
    df.withColumn("__h", h)
      .withColumn("shard",
        conv(substring(col("__h"), 1, 6), 16, 10).cast("long")
          % numShards)
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(substring(col("__h"), 7, 8), key)).cast("long") - 1L)
      .drop("__h")
  }

  /** Weighted sample of k rows without replacement — priority
    * sampling (Duffield/Lund/Thorup): row i gets priority
    * w_i / u_i for a uniform u_i and the k largest priorities win,
    * so inclusion probability tracks weight. u_i is the md5 coin as
    * an integer (content-derived: retry-stable and recomputable by
    * the oracle), and w/u is ONE IEEE division of exactly-
    * representable values — bit-identical across engines, unlike the
    * pow/log forms of A-Res sampling. Rows with null or non-positive
    * weight never win (priority <= 0).
    *
    * Scale: scan-level priorities + TakeOrderedAndProject top-k — no
    * global sort, no shuffle beyond the k-row reduction. */
  def prioritySample(df: DataFrame, key: Column, weight: Column,
                     k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = conv(coin(key), 16, 10).cast("long") + lit(1L)
    df.withColumn("__pri",
        when(weight.isNotNull && (weight > 0),
          weight.cast("double") / u))
      .filter(col("__pri").isNotNull)
      .orderBy(desc("__pri"), key)
      .limit(k)
      .drop("__pri")
  }

  /** Temperature-balanced corpus resampling — the multilingual mixing
    * rule (mT5/XLM-R style): a stratum's kept mass scales with
    * n^alpha, alpha<1, so head languages are downsampled relative to
    * the tail instead of drowning it. Deterministic form: stratum s
    * with n_s rows keeps the k_s = max(1, floor(n_s^alpha)) rows with
    * the smallest `order` values (pass a content hash as `order` for
    * a pseudo-random draw, or an id for the oracle-checkable form).
    *
    * alpha = 0.5 computes via sqrt, which IEEE 754 requires to be
    * correctly rounded — bit-identical across engines, so
    * floor(sqrt(n)) is safe under a hash gate; Math.pow is only
    * 1-ulp-accurate and could flip a floor at perfect powers.
    *
    * Scale shape (r16 — the skew audit's last corpus-sized stratum
    * window): one count aggregate (stratum-dim sized, broadcast
    * back), then a salted TWO-STAGE exact top-k instead of one
    * `row_number` over the raw stratum — a hot stratum (90% of a
    * crawl in one language, exactly the head this operator exists to
    * downsample) made that window partition un-splittable and
    * corpus-sized. Stage 1 ranks within (stratum, hash(order) mod S)
    * buckets of ~n_s/S rows — the average shuffle-partition load, the
    * best any shuffle achieves — and keeps each bucket's local top
    * k_s; a true global top-k_s row is top-k_s in ANY subset it
    * belongs to, so stage 1 is lossless. Stage 2 re-ranks the ≤ S·k_s
    * survivors per stratum exactly — k_s = n_s^alpha is SUBLINEAR, so
    * the one remaining stratum-keyed partition is Θ(S·n^alpha), not
    * Θ(n). The salt width S defaults to
    * min(spark.sql.shuffle.partitions, 1024): the stage-2 bound
    * GROWS with S, so inheriting a cluster-scale partition count
    * (10⁴–10⁵ is routine) uncapped would re-inflate the one
    * un-splittable partition to S·k ≈ 10⁹⁺ rows — the balanced choice
    * equalizes stage-1 load n/S against stage-2 load S·k at
    * S ≈ sqrt(n/k), a few hundred for any realistic corpus, and the
    * 1024 cap keeps the default within a small factor of that without
    * a pre-pass over the data. alpha = 1.0 keeps k = n (every row),
    * so it short-circuits to the input unchanged — running the
    * machinery would make stage 2 the exact corpus-sized stratum
    * window this rewrite removes. The bucket hash is content-derived (xxhash64 of the order
    * key), so retries and speculative tasks re-draw identically. With
    * a unique `order` the kept set is identical to the single-window
    * form (parity-spec'd); under order ties both forms keep an
    * arbitrary k-subset of the tied boundary rows. The legacy
    * single-window form stays behind `viaWindow` on the
    * `private[graft]` impl — parity spec only. */
  def temperatureResample(df: DataFrame, stratum: Column, order: Column,
                          alpha: Double): DataFrame =
    temperatureResampleImpl(df, stratum, order, alpha,
      saltBuckets = 0, viaWindow = false)

  private[graft] def temperatureResampleImpl(
      df: DataFrame, stratum: Column, order: Column, alpha: Double,
      saltBuckets: Int, viaWindow: Boolean): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    // alpha = 1 ⇒ k_s = n_s: every row of every stratum is kept, and
    // stage 2 would degenerate to the full single-stratum window this
    // operator exists to avoid — return the input unchanged instead
    // (the window form keeps the degenerate path for the parity spec)
    if (alpha == 1.0 && !viaWindow) return df
    val kExpr =
      if (alpha == 0.5) floor(sqrt(col("__n").cast("double")))
      else floor(pow(col("__n").cast("double"), lit(alpha)))
    val targets = df.groupBy(stratum.as("__s"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__k", greatest(lit(1L), kExpr.cast("long")))
    // null-safe: a NULL stratum is a real group and must keep its
    // max(1, floor(n^alpha)) rows, not silently vanish
    val joined = df.join(broadcast(targets), stratum <=> col("__s"))
    if (viaWindow)
      joined
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("__s")).orderBy(order)))
        .filter(col("__rn") <= col("__k"))
        .drop("__s", "__n", "__k", "__rn")
    else {
      // default salt width: the session's shuffle parallelism, CAPPED
      // at 1024 — stage 2's one stratum-keyed partition is Θ(S·k), so
      // a cluster-scale shuffle.partitions (10⁴–10⁵) inherited here
      // uncapped would re-inflate the exact skew this rewrite removes
      // (S=10⁵, k=10⁵ at n=10¹⁰/alpha=0.5 ⇒ 10¹⁰ rows back in ONE
      // partition); 1024 stays within a small factor of the balanced
      // S ≈ sqrt(n/k) for any realistic corpus while stage 1 buckets
      // (n/S rows) remain far below a shuffle partition's capacity
      val s =
        if (saltBuckets > 0) saltBuckets
        else math.min(1024, df.sparkSession.conf
          .get("spark.sql.shuffle.partitions").toInt)
      require(s > 0, s"temperatureResample: salt width must be " +
        s"positive, got $s (from spark.sql.shuffle.partitions)")
      val stage1 = joined
        .withColumn("__b", pmod(xxhash64(order), lit(s.toLong)))
        .withColumn("__r1", row_number().over(
          Window.partitionBy(col("__s"), col("__b")).orderBy(order)))
        .filter(col("__r1") <= col("__k"))
      stage1
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("__s")).orderBy(order)))
        .filter(col("__rn") <= col("__k"))
        .drop("__s", "__n", "__k", "__b", "__r1", "__rn")
    }
  }

  /** Per-stratum nucleus (top-p) selection by integral mass — the
    * corpus-curation shape of nucleus sampling: rank a stratum's rows
    * by `(mass desc, id asc)` and keep the smallest prefix whose
    * cumulative mass reaches `pct`% of the stratum total, emitting
    * the exact running cumulative as `cum` (a LONG; `mass` must be
    * integral and NON-NEGATIVE — char/token counts — so the cut
    * arithmetic is integer-exact and oracle-replayable; a negative
    * mass fails loudly in-plan, because the value-class pre-filter
    * below is unsound for it).
    *
    * Scale shape (r16 — the skew audit's last corpus-sized window,
    * with [[temperatureResample]]): a naive
    * `sum(mass) over (partition by stratum order by ...)` funnels a
    * hot stratum (90%-one-language crawl) into ONE un-splittable
    * window partition. Instead the prefix sum is decomposed over
    * VALUE CLASSES: a `groupBy(stratum, mass)` aggregate (map-side
    * combined — a hot class collapses per map task) gives each
    * class's mass and count; the class-frame windows (prefix and
    * total) run over a frame bounded by the mass DOMAIN per stratum
    * (distinct integral lengths — ~10⁶ for char counts), not by
    * corpus rows; classes whose before-class cumulative already
    * reaches the cut are pre-filtered BEFORE any row-level work, so
    * the only row-level window — the id tie-rank inside a class,
    * which reconstructs `cum = before_class + mass·rank` exactly —
    * shuffles just the nucleus plus its boundary class (output-sized)
    * and partitions by the (stratum, mass) TIE CLASS, hot only if one
    * exact length dominates a stratum. The class join-back is
    * sort-merge and AQE-skew-splittable (the scrub argument). Rows
    * with NULL mass drop, as in the window form (their `cum` is
    * NULL). Legacy single-window form behind `viaWindow` on the
    * `private[graft]` impl — parity spec only. */
  def nucleusCut(df: DataFrame, stratum: Column, mass: Column,
                 id: Column, pct: Int): DataFrame =
    nucleusCutImpl(df, stratum, mass, id, pct, viaWindow = false)

  private[graft] def nucleusCutImpl(
      df: DataFrame, stratum: Column, mass: Column, id: Column,
      pct: Int, viaWindow: Boolean): DataFrame = {
    require(pct > 0 && pct <= 100, s"pct must be in (0,100]: $pct")
    val inCols = df.columns.map(col).toSeq
    val base = df.withColumn("__s", stratum)
      .withColumn("__m", mass.cast("long"))
      .withColumn("__id", id)
    if (viaWindow) {
      val w = Window.partitionBy(col("__s"))
        .orderBy(desc("__m"), asc("__id"))
      base
        .withColumn("cum", sum("__m").over(w.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__total",
          sum("__m").over(Window.partitionBy(col("__s"))))
        .filter((col("cum") - col("__m")) * 100 < col("__total") * pct)
        .select(inCols :+ col("cum"): _*)
    } else {
      val vals = base
        .groupBy(col("__s").as("__vs"), col("__m").as("__vm"))
        .agg(count(lit(1)).as("__c"))
        // loud guard, riding the tiny class frame: the past-the-cut
        // class pre-filter is only sound for non-negative masses
        // (with m < 0 a row's cum_before runs BELOW its class's
        // before-class cumulative, so a dropped class could still
        // hold qualifying rows — a silent wrong answer); lengths and
        // token counts are never negative, so fail instead of guess
        // NULL masses pass through — their rows drop at the non-null-
        // safe join below, the documented window-form behavior
        .withColumn("__vm",
          when(col("__vm").isNull || col("__vm") >= 0, col("__vm"))
            .otherwise(assert_true(col("__vm") >= 0,
              lit("nucleusCut: mass must be non-negative (char/token " +
                "counts) — the value-class pre-filter is unsound for " +
                "negative masses")).cast("long")))
        .withColumn("__mass", col("__vm") * col("__c"))
        .withColumn("__cumv", sum("__mass").over(
          Window.partitionBy("__vs").orderBy(desc("__vm"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__beforev", col("__cumv") - col("__mass"))
        .withColumn("__total",
          sum("__mass").over(Window.partitionBy("__vs")))
        .select("__vs", "__vm", "__beforev", "__total")
      base
        .join(vals,
          col("__s") <=> col("__vs") && col("__m") === col("__vm"))
        // a row's cum is >= its class's before-class cumulative, so a
        // class past the cut can never contribute — drop it before
        // the row-level tie-rank window sees it
        .filter(col("__beforev") * 100 < col("__total") * pct)
        .withColumn("__r", row_number().over(
          Window.partitionBy(col("__s"), col("__m"))
            .orderBy(col("__id"))).cast("long"))
        .withColumn("cum", col("__beforev") + col("__m") * col("__r"))
        .filter((col("cum") - col("__m")) * 100 < col("__total") * pct)
        .select(inCols :+ col("cum"): _*)
    }
  }

  /** Token-budget packing, concat-and-split semantics: the documents
    * of a shard are concatenated in `id` order into one token stream,
    * the stream is cut every `budget` tokens, and each document is
    * assigned the chunk its LAST token falls in — the standard
    * sequence-packing step that turns documents into fixed-size
    * training windows (documents straddle chunk boundaries by design;
    * this labels rows for the downstream splitter, it is not a
    * bounded-bin packer).
    *
    * Sharded on purpose: packing is order-dependent, and a single
    * global order would serialize the window into one partition at
    * corpus scale. Real pipelines pack per shard (file, language,
    * source); the window partitions by `shard` and parallelizes. */
  def packTokenBudget(df: DataFrame, shard: Column, id: Column,
                      tokens: Column, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val cum = sum(tokens).over(
      Window.partitionBy(shard).orderBy(id)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("__cum", cum)
      .withColumn("chunk", ceil(col("__cum") / lit(budget.toLong)) - 1)
      .drop("__cum")
  }
}
