package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** STREAMING last-writer-wins upsert — the T4/CDC MERGE primitive
  * ([[graft.query.WarehouseQueries.cdcApply]]) as keyed streaming
  * state: a change stream (I/U/D ops with event-time + sequence
  * tiebreak) folds into one state row per key via
  * `mapGroupsWithState`, each micro-batch emitting the touched keys'
  * NEW state (update semantics). This is the missing face of the
  * streaming matrix: sessionize certifies flatMapGroups + event-time
  * timeout, the windowed/hourly gate certifies watermark aggregation,
  * stream-stream certifies two-sided join state — this certifies
  * mapGroups (exactly-one-state-per-key) upsert semantics across
  * micro-batch boundaries, pinned to the BATCH LWW oracle.
  *
  * Semantics, certified by q_stream_cdc: per key, the change with the
  * greatest (us, event_id) wins regardless of op; a winning D is a
  * tombstone (the key leaves the final table). Changes arriving in
  * any order WITHIN a batch fold identically (the handler is a pure
  * running maximum); cross-batch, state carries so a later batch's
  * change supersedes an earlier batch's state iff its (us, event_id)
  * is greater — byte-identical to the batch window over the union.
  *
  * Scale shape: state is ONE row per live key — the upsert table
  * itself, hash-partitioned across executors, bounded by key
  * cardinality, never by change-stream length. A retention-windowed
  * deployment evicts via event-time timeout exactly as
  * [[SessionStream]] does; the certification replay is bounded and
  * needs no eviction.
  */
object CdcStream {

  final case class Chg(user_id: Long, us: Long, event_id: Long,
                       op: String, value: Double)
  final case class KeyState(op: String, us: Long, event_id: Long,
                            value: Double)
  final case class Upsert(user_id: Long, last_op: String, last_us: Long,
                          last_event: Long, last_value: Double)

  /** LWW fold, factored out for direct unit testing: a pure running
    * maximum over (us, event_id) against the carried state — the
    * result is identical for ANY iteration order (each change is kept
    * only when strictly greater than everything seen), so the batch
    * needs no sort (review r10 finding). */
  private[streaming] def fold(cur: Option[KeyState],
                              batch: Seq[Chg]): KeyState = {
    var st = cur.orNull
    for (c <- batch) {
      if (st == null || c.us > st.us ||
          (c.us == st.us && c.event_id > st.event_id))
        st = KeyState(c.op, c.us, c.event_id, c.value)
    }
    st
  }

  def upsert(changes: Dataset[Chg]): Dataset[Upsert] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.user_id)
      .mapGroupsWithState[KeyState, Upsert](GroupStateTimeout.NoTimeout) {
        case (key, rows, state) =>
          val st = fold(state.getOption, rows.toSeq)
          state.update(st)
          Upsert(key, st.op, st.us, st.event_id, st.value)
      }
  }

  /** Replay a bounded change set through the real stateful stream in
    * event-time batches (span/`batches` slots — cross-batch event-time
    * order is what the gate certifies; within a batch the fold is
    * order-indifferent),
    * then reduce the per-batch emissions to the FINAL state per key:
    * a key's successive emissions carry its cumulative (us, event_id)
    * maximum, so the final state is the emission with the greatest
    * (last_us, last_event). No sentinels: mapGroupsWithState has no
    * watermark-driven emissions to flush. Update output mode (each
    * batch re-emits changed keys); no-data micro-batches off — the
    * flat-overhead lesson, PERF.md round 10. */
  def replay(spark: SparkSession, changes: Seq[Chg],
             batches: Int = 4): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    require(changes.nonEmpty, "replay needs at least one change")
    require(batches >= 3,
      "replay needs >= 3 micro-batches to certify cross-batch state carry")
    val mem = MemoryStream[Chg]
    val name = s"graft_cdc_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val partsKey = "spark.sql.shuffle.partitions"
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevParts = spark.conf.get(partsKey)
    val prevNoData = spark.conf.get(noDataKey, "true")
    spark.conf.set(partsKey, "2")
    spark.conf.set(noDataKey, "false")
    val minUs = changes.map(_.us).min
    val maxUs = changes.map(_.us).max
    val batchUs = math.max(1L, (maxUs - minUs) / batches + 1L)
    try {
      val q = upsert(mem.toDS()).toDF()
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        changes.groupBy(c => (c.us - minUs) / batchUs).toSeq.sortBy(_._1)
          .foreach { case (_, slot) =>
            mem.addData(slot)
            q.processAllAvailable()
          }
      } finally q.stop()
    } finally {
      spark.conf.set(partsKey, prevParts)
      spark.conf.set(noDataKey, prevNoData)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(desc("last_us"), desc("last_event"))
    spark.table(name)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
