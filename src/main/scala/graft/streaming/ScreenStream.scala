package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{BloomIndex, BloomJoin}

/** Streaming face of the persisted Bloom membership index
  * ([[graft.operators.BloomIndex]]) — the reference's 25-day
  * new-domain gate (`comm -23`, reference
  * `daily_certstream_download.sh:75-93`) at ingest time, with the
  * history carried as KB-sized blobs instead of a join side:
  *
  * per micro-batch,
  *  1. load the merged filter of base + every PRIOR delta,
  *  2. emit the batch's distinct keys the filter does NOT contain
  *     ("new" — the filter's no-false-negative guarantee makes this a
  *     subset of the exactly-new keys, short only of false positives
  *     at the stored fpp),
  *  3. APPEND the batch's keys to the index as `delta_<tag>` — so a
  *     key first seen in batch k is screened out of batch k+1: the
  *     dedup state crosses micro-batch AND restart boundaries through
  *     the index, not through Spark streaming state.
  *
  * Replay safety (foreachBatch is only at-least-once): the screen
  * loads the index EXCLUDING the batch's own tag, so a batch replayed
  * after a crash — even one that crashed after its delta landed —
  * probes the exact pre-batch index state; the output lands in a
  * per-batch directory with OVERWRITE and the delta append is the
  * store's tag-overwrite. Every step of a replay rewrites identical
  * content (certified by ScreenStreamSpec's double-run case).
  *
  * Scale shape: per batch the work is one blob-count-sized filter
  * merge, one codegen'd `graft_might_contain` scan of the batch, and
  * one batch-sized Bloom aggregate — history is never rescanned, and
  * streaming state stays EMPTY (no watermark bookkeeping), so the
  * 25-day window's size costs blobs, not executor state. */
object ScreenStream {

  /** One micro-batch of the screen, factored out so the cross-batch
    * spec can drive batches (and replays) directly. Writes the
    * batch's new keys to `outDir/new/batch=<tag>` (overwrite) and
    * banks the batch under `delta_<tag>`. */
  def screenBatch(batch: DataFrame, keyCol: String, indexPath: String,
                  outDir: String, tag: String): Unit = {
    val s = batch.sparkSession
    // exclude own tag: a replayed batch sees the PRE-batch index even
    // if its delta already landed before the crash
    val (blob, _) = BloomIndex.loadMergedFilter(s, indexPath,
      excludeTags = Set(tag))
    val keys = batch.select(col(keyCol))
      .where(col(keyCol).isNotNull).distinct()
    val fresh =
      if (blob == null) keys
      else keys.where(!BloomJoin.mightContain(blob, col(keyCol)))
    // output BEFORE the delta append — both are idempotent, but this
    // order means a crash between them replays with the output
    // already correct rather than recomputed from a polluted filter
    fresh.write.mode("overwrite").parquet(s"$outDir/new/batch=$tag")
    BloomIndex.appendBloomIndex(s, indexPath, batch, col(keyCol), tag)
  }

  /** Checkpointed exactly-once screen of a key stream against (and
    * into) a persisted Bloom index. Blocks-free; callers
    * `awaitTermination()`. New-key emissions accumulate under
    * `outDir/new/` (one partition dir per batch). */
  def screenNewKeys(stream: DataFrame, keyCol: String, indexPath: String,
                    checkpointDir: String, outDir: String)
      : StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        screenBatch(batch, keyCol, indexPath, outDir, s"b$batchId")
      }
      .start()
}
