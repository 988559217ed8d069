package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{BloomIndex, CmsIndex, HistIndex, QuantileIndex, SketchOps}

/** The BANKING face of the persisted-index family for streaming
  * ingest — where [[ScreenStream]] reads the Bloom index per
  * micro-batch, this writes ALL FOUR indexes per micro-batch: one
  * `delta_b<batchId>` per index per batch, so the day's profile
  * (seen-before set, per-segment distinct counts, term frequencies,
  * value distribution) is maintained as the stream lands, and any
  * later reader answers from KB/MB blobs without touching the ingested
  * rows again.
  *
  * Exactly-once by the family's standing argument: foreachBatch is
  * at-least-once, but every append is a TAG OVERWRITE keyed by the
  * deterministic batch id, so a replayed batch rewrites its own
  * deltas — for Bloom/HLL the merge is idempotent anyway; for CMS and
  * Hist (counter addition) the overwrite carries the whole burden.
  * Each index banks at its STORED geometry (params pinned at init).
  *
  * Init: call the four `save*Index` methods once (an EMPTY day-zero
  * base is fine — Bloom banks a NULL blob the load skips, the others
  * bank zero rows/counters) — the saves pin capacity/lgK/eps/bins for
  * every later streamed delta. ProfileStreamSpec certifies the
  * streamed indexes equal fresh single-pass builds of the full input
  * at each family's strongest gate (byte-identity / estimate equality
  * / exact row equality), across a restart and under batch replay. */
object ProfileStream {

  /** One micro-batch of banking, factored out for the replay spec.
    * `quantPath` (r20 — the seventh family joins the streamed face)
    * banks the value stream into the approximate-quantile index at
    * its stored k; same tag-overwrite replay story as CMS/Hist
    * (sketch insertion is not idempotent, the overwrite is). */
  def bankBatch(batch: DataFrame, key: String, seg: String,
                value: String, bloomPath: String, hllPath: String,
                cmsPath: String, histPath: String, tag: String,
                quantPath: Option[String] = None): Unit = {
    val s = batch.sparkSession
    BloomIndex.appendBloomIndex(s, bloomPath, batch, col(key), tag)
    SketchOps.appendSketchIndex(s, hllPath, batch, col(seg), col(key),
      tag)
    CmsIndex.appendCmsIndex(s, cmsPath, batch, col(seg), tag)
    HistIndex.appendHistIndex(s, histPath, batch, col(value), tag)
    quantPath.foreach(qp =>
      QuantileIndex.appendQuantileIndex(s, qp, batch, col(value), tag))
  }

  /** Checkpointed exactly-once banking of a stream into the
    * pre-initialized indexes (four always; the quantile index too
    * when `quantPath` is given). */
  def bankStream(stream: DataFrame, key: String, seg: String,
                 value: String, bloomPath: String, hllPath: String,
                 cmsPath: String, histPath: String,
                 checkpointDir: String,
                 quantPath: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        bankBatch(batch, key, seg, value, bloomPath, hllPath, cmsPath,
          histPath, s"b$batchId", quantPath)
      }
      .start()
}
