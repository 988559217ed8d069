package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dominant principal direction of an embedding table by power
  * iteration — the "what single axis explains this collection"
  * diagnostic (embedding drift, batch effects, degenerate encoder
  * collapse), made ''bit-exact'' the same way [[PageRank]] and
  * [[Hits]] are: every float is quantized ONCE up front
  * (`q = round(x · qscale)`, exact in both engines), after which the
  * Gram matrix, the matvecs, and the max-entry rescale are pure
  * integer arithmetic — order-independent sums, so a distributed run
  * hash-certifies against an unrolled SQL oracle value-for-value.
  * (A float covariance would sum in shuffle order; a float power
  * step would compound it.)
  *
  * Semantics, certified by the oracle: `G[i,j] = Σ_rows q_i·q_j`
  * (the un-centered Gram/second-moment matrix — centering is a
  * caller-side subtraction when wanted); `v_0 = vscale·1`;
  * `v_{t+1}[i] = sign(r_i)·(|r_i|·vscale div max|r|)` with
  * `r = G·v_t`. Sign-magnitude rescale, NOT plain integer division:
  * Spark's `div` truncates toward zero while DuckDB's `//` floors,
  * so negative components would round differently — on magnitudes
  * the two agree.
  *
  * Scale shape: the Gram matrix builds by PER-TASK dense-array
  * accumulation (the bounded-alphabet trainer pattern the native
  * bigram LM established, [[graft.plans.LmExpressions]]): each task
  * folds its rows into one local d²-cell long array and emits exactly
  * d² partial rows, so the shuffle carries d² rows per task regardless
  * of corpus size and NO row is ever exploded (the previous
  * explode-transform form emitted d² rows per INPUT row — 205M
  * intermediate rows at sf0.1, and the measured bulk of the old 3.2 s
  * bench entry). Each iteration is a join/aggregate over the d²-row
  * Gram frame only; the corpus is scanned exactly once.
  *
  * Overflow headroom: the binding product is the rescale step's
  * `|r|·vscale` with `|r| ≤ dims·cellMax·vscale`, so the invariant is
  * `dims·cellMax·vscale² ≤ Long.Max` — at the defaults (qscale 2^6,
  * vscale 10^4, dims 64) that holds |x| ≤ 1 embeddings to ~350k rows;
  * enforced per Gram cell with a loud inline `assert_true` riding the
  * cells plan, not a silent wrap. Direction diagnostics tolerate the
  * coarse 6-bit input quantization; callers with small corpora can
  * raise qscale.
  *
  * Driver round-trips (r10 verdict item 6): the per-iteration
  * `max|r|` travels as a broadcast 1-row frame INSIDE the lazy plan —
  * the [[Hits]] pattern — and the zero-vector/overflow guards ride the
  * same expressions as inline `assert_true`s, so each iteration costs
  * exactly ONE job (the raw checkpoint), with no blocking `.first()`
  * scalar fetches (previously two driver round-trips per iteration —
  * the serialized-tiny-jobs tail q_pca_power's bench entry measured). */
object PowerIteration {

  /** @param vectors df with a float-array embedding column
    * @param dims    embedding dimensionality (validated)
    * @param iters   fixed matvec iterations (≥ 1)
    * @return (i, v) — 1-based component index, scaled component of
    *         the iterated direction (max |v| = vscale) */
  def dominantDirection(vectors: DataFrame, vecCol: String, dims: Int,
                        iters: Int, qscale: Long = 64L,
                        vscale: Long = 10000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val spark = vectors.sparkSession
    import spark.implicits._
    val q = vectors.select(expr(
      s"transform($vecCol, x -> cast(round(x * $qscale) as bigint)) as qv"))
    // the overflow headroom check rides the cells plan as a per-cell
    // inline assert_true (fires during the checkpoint job) — no
    // driver-side max fetch
    val cellLim = Long.MaxValue / vscale / vscale / dims
    val cellGuard = coalesce(
      assert_true(abs(col("__c")) <= cellLim,
        lit(s"power-iteration overflow headroom: a |Gram cell| " +
          s"exceeds Long.Max/(vscale^2*dims) = $cellLim; lower qscale " +
          s"or vscale")).cast("long"),
      lit(0L))
    // one scan: each task folds its rows into a local d^2 array and
    // emits d^2 partial cells — the shuffle is d^2 rows per task, no
    // per-row explode (the LM dense-array-trainer pattern).
    // Per-partition partial bound: each term is ≤ qscale², so
    // |partial| ≤ qscale² · rows-per-partition (~4.1e3 · rows at the
    // default qscale) — far below Long.Max at any realistic partition
    // size. Note the final guard does NOT dominate the partials:
    // off-diagonal cells are signed, so cross-partition cancellation
    // can leave |total| < |partial|.
    val cells = q
      .filter(size(col("qv")) === dims)
      .select(col("qv")).as[Seq[Long]]
      .mapPartitions { it =>
        val acc = new Array[Long](dims * dims)
        var any = false
        for (row <- it) {
          any = true
          var i = 0
          while (i < dims) {
            val xi = row(i)
            var j = 0
            while (j < dims) { acc(i * dims + j) += xi * row(j); j += 1 }
            i += 1
          }
        }
        if (!any) Iterator.empty
        else Iterator.tabulate(dims * dims)(c =>
          (c / dims + 1, c % dims + 1, acc(c)))
      }
      .toDF("i", "j", "p")
      .groupBy("i", "j").agg(sum("p").as("__c"))
      .select(col("i"), col("j"), (cellGuard + col("__c")).as("c"))
      // LAZY checkpoint: the degenerate-input guard's count() below is
      // the materializing action, so guard + checkpoint cost exactly
      // ONE job (the eager form + a separate limit(1) probe was two).
      // Measured r13: guard-on vs guard-off is within host noise at
      // sf0.1 — the r12 verdict's +0.29 s suspicion was host drift,
      // not this probe (PERF.md round 13); the fold is still right,
      // it just buys tidiness rather than the 0.3 s.
      .localCheckpoint(false)
    // degenerate-input guard: with an empty corpus (or every row failing
    // the size(qv) === dims filter) the Gram frame is empty, every
    // iteration's crossJoin against the broadcast max produces ZERO rows,
    // and the collapsed-to-zero assert_true never evaluates — the
    // function would return a silently empty frame.
    require(cells.count() > 0,
      s"power iteration over a degenerate corpus: no $vecCol rows of " +
        s"dims = $dims survived the scan (empty input, or every vector " +
        s"has a different length)")

    var v = spark.range(1, dims + 1)
      .select(col("id").as("j"), lit(vscale).as("v"))
    // each raw checkpoint is freed once the NEXT one has eagerly
    // materialized past it (the new raw's job consumed the old v, which
    // was the only reference) — the pending-buffer discipline, ADVICE r9
    var prevRaw: DataFrame = null
    for (_ <- 1 to iters) {
      val raw = cells.join(v, "j")
        .groupBy(col("i").as("comp"))
        .agg(sum(col("c") * col("v")).as("raw"))
        // both the max aggregate and the rescale join read raw — the
        // cut keeps each iteration at exactly one materialization
        .localCheckpoint(true)
      if (prevRaw != null) prevRaw.unpersist()
      prevRaw = raw
      // max|r| as a broadcast 1-row frame inside the lazy plan (the
      // Hits pattern); the collapsed-to-zero guard rides it inline
      val maxF = raw.agg(max(abs(col("raw"))).as("__m"))
      val mGuard = coalesce(
        assert_true(col("__m").isNotNull && col("__m") > 0L,
          lit("power iteration collapsed to the zero vector"))
          .cast("long"),
        lit(0L))
      v = raw.crossJoin(broadcast(maxF))
        .select(col("comp").as("j"),
          // sign-magnitude: truncation-on-magnitude agrees across engines
          (mGuard + signum(col("raw")).cast("long") *
            expr(s"(abs(raw) * $vscale) div __m")).as("v"))
    }
    // the output is checkpointed so the last raw frame and the Gram
    // cells can be released before returning (nothing downstream
    // re-derives them)
    val out = v.select(col("j").as("i"), col("v")).orderBy("i")
      .localCheckpoint(true)
    if (prevRaw != null) prevRaw.unpersist()
    cells.unpersist()
    out
  }
}
