package graft.query

import graft.SparkTestBase
import graft.operators.Skew

/** Mechanical closure of the r14–r16 window-skew audits: every gated
  * query's optimized plan is swept for EMPTY-partition windows — the
  * `over ()` shape that funnels the entire frame into one
  * un-splittable task (AQE cannot split a window partition). The
  * hand audits caught five of these across three rounds; this spec
  * makes the class a compile-gate so a sixth cannot land silently.
  * Whitelisted entries are windows over frames bounded tiny BY
  * CONSTRUCTION (each justified inline and re-verified here to still
  * exist, so the whitelist cannot rot into covering new offenders).
  */
class WindowAuditSpec extends SparkTestBase {

  val dir = "/root/testdata/sf0.001"

  test("no gated query plans an empty-partition window, except the " +
      "documented bounded-frame ones") {
    val whitelist: Map[String, String] = Map(
      "q_drift_ks" -> ("CDF cumulative over the DISTINCT-discretized-" +
        "value frame; boundedness is the operator's contract, " +
        "enforced by the in-plan cardinality guard (Drift.scala:41-77)"),
      "q_drift_psi" -> "fixed nBuckets histogram frame (Drift.scala:125)",
      "q_hybrid_rrf" -> ("both fused rankings ride .limit(20) " +
        "shortlists before their global rank (VectorQueries.hybridRrf)"),
      "q_lm_quality" -> ("bitRateBuckets tercile pass over the per-key " +
        "count table — bounded by the scaled-integer bit-rate domain, " +
        "not corpus rows (TextAnalysis.bitRateBuckets)"),
      "q_lm_quality_cross" -> "same bitRateBuckets frame as q_lm_quality",
      "q_sim_ivf_recall" -> ("200-row recall-gate frame by construction " +
        "(VectorQueries.scala:319)"),
      "q_sim_lsh_recall" -> "200-row recall-gate frame by construction",
      "q_sim_pq_recall" -> "200-row recall-gate frame by construction",
      "q_vocab_encode" -> ("vocab rank window runs after " +
        ".limit(maxVocab) — bounded by the cap (TextAnalysis.vocabEncode)"),
      "q_value_profile_inc" -> ("cumulative count over the loaded " +
        "histogram — bin-spec-bounded (≤ nBins + 2 = 18 rows by " +
        "construction, HistIndex.loadHistogram), never data-sized"),
      "q_value_quantiles_inc" -> ("the same bin-spec-bounded cum " +
        "frame inside HistIndex.quantileBins"),
      "q_stream_profile_inc" -> ("the q_value_profile_inc cum frame " +
        "over the STREAMED histogram index — same ≤ nBins + 2 = 18 " +
        "row bound by construction (PipelineQueries.streamProfileInc)"))
    val results = graft.SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val ws =
          try Skew.emptyPartitionWindows(fn(spark, dir))
          catch {
            case e: Throwable =>
              fail(s"$name failed to build a plan: $e")
          }
        (name, ws)
    }
    val offenders = results.filter { case (n, ws) =>
      ws.nonEmpty && !whitelist.contains(n)
    }
    assert(offenders.isEmpty, offenders.map { case (n, ws) =>
      s"$n:\n  ${ws.mkString("\n  ")}"
    }.mkString("\n"))
    // whitelist hygiene: every entry must still name a live query
    // that still has the window it excuses — otherwise the entry is
    // stale and must be deleted
    val byName = results.toMap
    whitelist.foreach { case (n, why) =>
      assert(byName.contains(n), s"whitelist names a dead query: $n")
      assert(byName(n).nonEmpty,
        s"whitelist entry for $n ('$why') is stale: no empty-" +
          "partition window remains — delete the entry")
    }
  }
}
