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
  * driver-fed MemoryStreams advanced in event-time lockstep, weekly
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
    * advancing BOTH streams one event-time week per micro-batch (the
    * lockstep arrival order that makes streaming == batch exact),
    * then sentinel-flushing both watermarks. */
  def replay(spark: SparkSession, views: Seq[Ev], purchases: Seq[Ev],
             windowUs: Long, joinType: String = "inner"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    require(views.nonEmpty && purchases.nonEmpty,
      "replay needs events on both sides")
    val memV = MemoryStream[Ev]
    val memP = MemoryStream[Ev]
    val name = s"graft_sjoin_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val partsKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(partsKey)
    spark.conf.set(partsKey, "4")
    val weekUs = 7L * 86400000000L
    val maxUs = (views ++ purchases).map(_.us).max
    try {
      val q = viewPurchase(memV.toDS(), memP.toDS(), windowUs,
          joinType = joinType)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        val weeks = (views.map(_.us / weekUs) ++
          purchases.map(_.us / weekUs)).distinct.sorted
        val vByW = views.groupBy(_.us / weekUs)
        val pByW = purchases.groupBy(_.us / weekUs)
        weeks.foreach { w =>
          memV.addData(vByW.getOrElse(w, Seq.empty))
          memP.addData(pByW.getOrElse(w, Seq.empty))
          q.processAllAvailable()
        }
        for (i <- 0 to 1) {
          val f = maxUs + windowUs + (i + 2) * 2L * 86400000000L
          memV.addData(Seq(Ev(-1L, f, -1L)))
          memP.addData(Seq(Ev(-2L, f, -2L)))
          q.processAllAvailable()
        }
      } finally q.stop()
    } finally spark.conf.set(partsKey, prevParts)
    spark.table(name).filter(col("user_id") >= 0)
  }
}
