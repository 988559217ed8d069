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
  * Scale shape: the Gram matrix builds as one scan-level nested
  * `transform` emitting d² cells per row into a map-side-combined
  * aggregate — the shuffle carries at most d² rows per map partition
  * regardless of corpus size (the [[graft.operators.TextAnalysis]]
  * bounded-alphabet trick, here with d² cells). Each iteration is a
  * join/aggregate over the d²-row Gram frame only; the corpus is
  * scanned exactly once.
  *
  * Overflow headroom: the binding product is the rescale step's
  * `|r|·vscale` with `|r| ≤ dims·cellMax·vscale`, so the invariant is
  * `dims·cellMax·vscale² ≤ Long.Max` — at the defaults (qscale 2^6,
  * vscale 10^4, dims 64) that holds |x| ≤ 1 embeddings to ~350k rows;
  * enforced on the ACTUAL max cell with a loud require, not a silent
  * wrap. Direction diagnostics tolerate the coarse 6-bit input
  * quantization; callers with small corpora can raise qscale. */
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
    // one scan: d^2 (i, j, qi*qj) cells per row, combined map-side
    val cells = q
      .filter(size(col("qv")) === dims)
      .select(explode(expr(
        """flatten(transform(qv, (x, i) ->
          |  transform(qv, (y, j) ->
          |    struct(i + 1 as i, j + 1 as j, x * y as p))))"""
          .stripMargin)).as("c"))
      .select(col("c.i"), col("c.j"), col("c.p"))
      .groupBy("i", "j").agg(sum("p").as("c"))
      .localCheckpoint(true)
    val cellMax = cells.agg(max(abs(col("c")))).first().getLong(0)
    require(cellMax <= Long.MaxValue / vscale / vscale / dims,
      s"power-iteration overflow headroom: max |Gram cell| $cellMax " +
        s"exceeds Long.Max/(vscale^2*dims); lower qscale or vscale")

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
        .localCheckpoint(true) // scalar max below must not re-derive
      if (prevRaw != null) prevRaw.unpersist()
      prevRaw = raw
      val m = raw.agg(max(abs(col("raw")))).first().getLong(0)
      require(m > 0L, "power iteration collapsed to the zero vector")
      v = raw.select(col("comp").as("j"),
        // sign-magnitude: truncation-on-magnitude agrees across engines
        (signum(col("raw")).cast("long") *
          expr(s"(abs(raw) * $vscale) div $m")).as("v"))
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
