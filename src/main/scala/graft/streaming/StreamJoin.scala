package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM interval join — the attribution shape
  * ("purchase within 2 hours of a view, per user") as a genuine
  * two-stream join: both sides watermarked, the time-range condition
  * bounding join state, append mode emitting each match exactly once.
  * This is the hardest-to-get-right structured-streaming operator
  * (state on BOTH sides, eviction driven by the range condition), and
  * the q_stream_join gate pins it to the plain batch join
  * row-for-row.
  *
  * Scale shape: each side buffers only rows inside the watermark +
  * range-condition horizon (here ≤ 2 h of views per user, purchases
  * evicted on arrival of the watermark) — state is bounded by the
  * join window, never by stream length. The replay harness (two
  * driver-fed MemoryStreams advanced in event-time lockstep, span/4
  * batches, sentinel flush) is the documented verification boundary,
  * as in [[SessionStream.replayWeekly]].
  */
object StreamJoin {

  final case class Ev(user_id: Long, us: Long, event_id: Long)

  /** views ⋈ purchases within `windowUs` after the view, per user.
    * `joinType` "inner" or "left_outer": the outer form additionally
    * emits each unmatched view exactly once, null-padded, when the
    * watermark passes its match horizon — the subtlest append-mode
    * emission rule there is, certified by q_stream_join_outer. */
  def viewPurchase(views: org.apache.spark.sql.Dataset[Ev],
                   purchases: org.apache.spark.sql.Dataset[Ev],
                   windowUs: Long,
                   watermarkDelay: String = "0 seconds",
                   joinType: String = "inner"): DataFrame = {
    val v = views
      .withColumn("v_time", timestamp_micros(col("us")))
      .withWatermark("v_time", watermarkDelay)
      .select(col("user_id").as("v_user"), col("us").as("v_us"),
        col("event_id").as("v_event"), col("v_time"))
    val p = purchases
      .withColumn("p_time", timestamp_micros(col("us")))
      .withWatermark("p_time", watermarkDelay)
      .select(col("user_id").as("p_user"), col("us").as("p_us"),
        col("event_id").as("p_event"), col("p_time"))
    v.join(p,
      col("v_user") === col("p_user") &&
        col("p_time") >= col("v_time") &&
        // microsecond interval — a seconds-denominated literal would
        // silently truncate sub-second windows (review r9 finding)
        col("p_time") <= col("v_time") +
          expr(s"interval $windowUs microseconds"),
      joinType)
      .select(col("v_user").as("user_id"), col("v_event"),
        col("p_event"), col("v_us"), col("p_us"))
  }

  /** Replay both bounded event sets through the real two-stream join,
    * advancing BOTH streams in event-time lockstep (the arrival order
    * that makes streaming == batch exact), then sentinel-flushing both
    * watermarks. The certified invariant is CROSS-BATCH event-time
    * ordering, not batch width — within a batch the join is
    * order-indifferent — so the replay uses the widest batching that
    * still exercises `batches` genuine watermark advances on both
    * sides (span/4 by default — 4 data batches + 2 sentinel flushes =
    * 6 watermark advances). Two further measured facts shape the
    * harness (measured via query progress, PERF.md round 10):
    * per-micro-batch cost is a FLAT
    * ~0.5 s of addBatch/planning/commit overhead regardless of rows,
    * partitions, or checkpoint medium, so batch count is the only
    * lever; and the default watermark-advance no-data batch after
    * every data batch doubles that count for nothing here, because
    * each advance is always followed by another DATA batch (the
    * two-sentinel tail exists precisely so the last real watermark
    * advance gets a deterministic data batch to flush under — the
    * SessionStream design), so no-data micro-batches are disabled
    * for the replay and restored after (verdict r9 item 4). */
  def replay(spark: SparkSession, views: Seq[Ev], purchases: Seq[Ev],
             windowUs: Long, joinType: String = "inner",
             batches: Int = 4): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    require(views.nonEmpty && purchases.nonEmpty,
      "replay needs events on both sides")
    require(batches >= 3,
      "replay needs >= 3 micro-batches to certify cross-batch ordering")
    val memV = MemoryStream[Ev]
    val memP = MemoryStream[Ev]
    val name = s"graft_sjoin_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val partsKey = "spark.sql.shuffle.partitions"
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevParts = spark.conf.get(partsKey)
    val prevNoData = spark.conf.get(noDataKey, "true")
    val minUs = math.min(views.map(_.us).min, purchases.map(_.us).min)
    val maxUs = math.max(views.map(_.us).max, purchases.map(_.us).max)
    val batchUs = math.max(1L, (maxUs - minUs) / batches + 1L)
    // 2 partitions keep the join genuinely shuffled while bounding the
    // per-batch state-store lifecycle; no-data batches off — see the
    // scaladoc (flushes ride the guaranteed next data batch). Set
    // AFTER every precondition, so a throwing require cannot leak the
    // overrides past the restoring finally (review r10 finding)
    spark.conf.set(partsKey, "2")
    spark.conf.set(noDataKey, "false")
    try {
      val q = viewPurchase(memV.toDS(), memP.toDS(), windowUs,
          joinType = joinType)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        def slot(us: Long): Long = (us - minUs) / batchUs
        val slots = (views.map(e => slot(e.us)) ++
          purchases.map(e => slot(e.us))).distinct.sorted
        val vByS = views.groupBy(e => slot(e.us))
        val pByS = purchases.groupBy(e => slot(e.us))
        slots.foreach { w =>
          memV.addData(vByS.getOrElse(w, Seq.empty))
          memP.addData(pByS.getOrElse(w, Seq.empty))
          q.processAllAvailable()
        }
        for (i <- 0 to 1) {
          val f = maxUs + windowUs + (i + 2) * 2L * 86400000000L
          memV.addData(Seq(Ev(-1L, f, -1L)))
          memP.addData(Seq(Ev(-2L, f, -2L)))
          q.processAllAvailable()
        }
      } finally q.stop()
    } finally {
      spark.conf.set(partsKey, prevParts)
      spark.conf.set(noDataKey, prevNoData)
    }
    spark.table(name).filter(col("user_id") >= 0)
  }
}
