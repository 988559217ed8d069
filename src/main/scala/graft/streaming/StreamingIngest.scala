package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}
import graft.etl.Migrator
import graft.sources.OrderedSink

/** Structured-Streaming form of the daily ingest (SURVEY §2.9).
  *
  * The reference streams operationally — cron moves processed files to
  * `old_csv_input/` for exactly-once-per-file (T1,
  * daily_all_upload.sh:16-19) and dedups against 25 daily snapshots via
  * `comm -23` (T2, daily_certstream_download.sh:75-93). Here:
  *
  *  - T1 = checkpointed file source + `Trigger.AvailableNow`: each file
  *    processed exactly once across restarts, no file moves;
  *  - T2 = `withWatermark("obs_ts", "25 days").dropDuplicates("domain")`:
  *    state expires exactly when the reference's window forgets;
  *  - T3 = ingest timestamps are applied inside Migrator at write;
  *  - T4 = last-write-wins compaction via [[DomainStateTracker]]
  *    (mapGroupsWithState) or batch row_number dedup.
  *
  * Scale: the watermark bounds state to ~25 days of distinct domains;
  * state is hash-partitioned across executors. foreachBatch keeps the
  * three-table fan-out a plain batch write per micro-batch.
  */
object StreamingIngest {

  /** T1+T3: checkpointed exactly-once ingest of massdns CSV files into
    * the three tables. Blocks until all currently-available files are
    * processed (AvailableNow).
    *
    * Exactly-once END-TO-END, not just at the source: foreachBatch is
    * only at-least-once (a crash between the table writes and the
    * checkpoint commit replays the batch), so each write lands in a
    * `batch=<id>` subdirectory with OVERWRITE — a replayed batch
    * rewrites its own directory instead of appending duplicates.
    * Readers see one partition-discovery column `batch`; compaction to
    * the clustered layout runs as a separate job. */
  def ingestAvailableNow(spark: SparkSession, inputDir: String,
                         checkpointDir: String, outDir: String,
                         tlds: Set[String], geo: Option[DataFrame],
                         source: String): StreamingQuery = {
    val lines = spark.readStream
      .option("maxFilesPerTrigger", 64)
      .text(inputDir)
    lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // three outputs materialize below -> cache the parsed
        // intermediate (Migrator.run's own documented contract)
        val out = Migrator.run(batch, tlds, geo, source,
          cacheParsed = true)
        // idempotent per batchId: replay after a mid-write crash
        // overwrites the same directories -> no duplicate rows
        out.rdnsv4.write.mode("overwrite")
          .parquet(s"$outDir/rdnsv4/batch=$batchId")
        out.subdomains.write.mode("overwrite")
          .parquet(s"$outDir/subdomains/batch=$batchId")
        out.cnames.write.mode("overwrite")
          .parquet(s"$outDir/cnames/batch=$batchId")
        ()
      }
      .start()
  }

  /** T2: streaming dedup with a 25-day watermark. Input must carry
    * (domain STRING, obs_ts TIMESTAMP). Late rows beyond the watermark
    * are dropped; a domain re-observed within the window is suppressed. */
  def dedupWindow(domains: DataFrame, watermark: String = "25 days"): DataFrame =
    domains
      .withWatermark("obs_ts", watermark)
      .dropDuplicates("domain")

  final case class DomainObs(domain: String, obs_ts: java.sql.Timestamp)

  /** T2 under the correctness gate: replay observations through the
    * REAL streaming dedup ([[dedupWindow]]) as one micro-batch per
    * distinct day (ascending), collect the append-mode memory sink.
    * With a span inside the watermark no state expires, so the emitted
    * set must equal "first observation per domain" — which a batch
    * engine (the DuckDB oracle) computes closed-form. Only the key and
    * the batch DAY of each emission are deterministic (within-batch
    * row order is not), so callers project to (domain, day).
    *
    * The day-batch iteration is a replay HARNESS: observations enter
    * through a streaming source (MemoryStream) exactly as production
    * rows would; bound the input (the driver query replays a 5-day
    * tail) — this is a verification path, not a bulk path. */
  def replayDailyDedup(spark: SparkSession, obs: Seq[DomainObs],
                       watermark: String = "25 days"): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val mem = MemoryStream[DomainObs]
    val name = s"graft_replay_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    // watermarked queries normally run a NO-DATA micro-batch after
    // each data batch to advance the watermark and evict state —
    // doubling the batch count. First-seen emission happens in the
    // data batch itself and the replay span sits inside the watermark
    // (nothing may expire), so eviction timing cannot affect the
    // result; skip those batches for the replay's lifetime.
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = spark.conf.get(noDataKey)
    spark.conf.set(noDataKey, "false")
    // State-store partition count is captured from shuffle.partitions
    // at stream start and every micro-batch pays an open/commit per
    // state partition. The replay corpus is verification-bounded
    // (caller collects it through the driver), so 4 partitions cut the
    // per-batch state overhead ~8x; a production stream would keep the
    // session default.
    val partsKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(partsKey)
    spark.conf.set(partsKey, "4")
    // start() sits INSIDE the restoring try: if stream start throws,
    // the session-wide 4-partition override must not leak to later
    // queries (same for noDataMicroBatches)
    try {
      val q = dedupWindow(mem.toDF(), watermark)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        obs.groupBy(o => o.obs_ts.toLocalDateTime.toLocalDate)
          .toSeq.sortBy(_._1)
          .foreach { case (_, dayRows) =>
            mem.addData(dayRows)
            q.processAllAvailable()
          }
      } finally q.stop()
    } finally {
      spark.conf.set(noDataKey, prevNoData)
      spark.conf.set(partsKey, prevParts)
    }
    spark.table(name)
  }
  /** T2 under a PRODUCTION-SHAPED harness: observations are staged as
    * one parquet file per day and fed through the real watermarked
    * dedup stream via a checkpointed FILE source, one AvailableNow run
    * per day — each run RESTARTS the query and resumes dedup state
    * from the checkpoint exactly like a daily ingest job would, and
    * first-seen emissions append idempotently per batch id (the
    * [[ingestAvailableNow]] overwrite-by-batch-dir protocol). Unlike
    * [[replayDailyDedup]] no data moves through the driver; the same
    * closed-form first-observation oracle applies, and cross-restart
    * state resume (day N's state suppressing day N+1 re-observations)
    * is part of what is certified. `baseDir` is wiped first. */
  def replayDailyDedupFiles(spark: SparkSession, obs: DataFrame,
                            baseDir: String,
                            watermark: String = "25 days"): DataFrame = {
    // Hadoop FileSystem throughout (not java.nio) so baseDir may be any
    // supported scheme — hdfs://, s3a://, file:// — not just local disk
    val basePath = new org.apache.hadoop.fs.Path(baseDir)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(basePath, true)
    val in = s"$baseDir/in"; val ckpt = s"$baseDir/ckpt"
    val out = s"$baseDir/out"
    fs.mkdirs(new org.apache.hadoop.fs.Path(in))
    // same bounded-replay session overrides as replayDailyDedup, same
    // always-restore protocol
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = spark.conf.get(noDataKey)
    val partsKey = "spark.sql.shuffle.partitions"
    val prevParts = spark.conf.get(partsKey)
    spark.conf.set(noDataKey, "false")
    spark.conf.set(partsKey, "4")
    try {
      val days = obs.select(to_date(col("obs_ts")).as("day"))
        .distinct().orderBy("day").collect().map(_.getDate(0))
      days.zipWithIndex.foreach { case (day, i) =>
        val tmp = s"$baseDir/stage_$i"
        obs.filter(to_date(col("obs_ts")) === lit(day))
          .select("domain", "obs_ts")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
          .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
        // fs.rename signals failure by RETURN VALUE (the java.nio
        // Files.move it replaced threw); ignoring it would silently
        // drop a day's input and replay with missing data
        require(
          fs.rename(part, new org.apache.hadoop.fs.Path(f"$in/day$i%03d.parquet")),
          s"rename failed: $part -> $in/day$i%03d.parquet")
        dedupWindow(
            spark.readStream.schema("domain STRING, obs_ts TIMESTAMP")
              .parquet(in), watermark)
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch.write.mode("overwrite").parquet(s"$out/batch=$batchId")
            ()
          }
          .start()
          .awaitTermination()
      }
    } finally {
      spark.conf.set(noDataKey, prevNoData)
      spark.conf.set(partsKey, prevParts)
    }
    spark.read.parquet(out).select("domain", "obs_ts")
  }

  /** Streaming decontamination gate: each micro-batch of incoming
    * documents (doc_id, text, ...) is screened against a STATIC
    * reference corpus' prebuilt banded-MinHash index
    * ([[graft.operators.Dedup.buildMinhashIndex]]) and split to
    * `clean/` and `flagged/` parquet, idempotently per batch id (the
    * same overwrite-by-batch-dir protocol as [[ingestAvailableNow]]).
    *
    * Why foreachBatch and not a stateful stream: the near-dup ladder
    * (band join -> est-prune groupBy -> exact verify) is a batch plan,
    * and screening is STATELESS across batches — each batch only
    * consults the static index, so there is no streaming state to
    * carry; the checkpoint provides exactly-once file progress. At
    * scale the per-batch cost is the incoming batch's signatures plus
    * a join against the (persisted) index — the corpus is never
    * rescanned. */
  def screenIngest(streamDocs: DataFrame,
                   index: graft.operators.Dedup.MinhashIndex,
                   threshold: Double, idCol: String, textCol: String,
                   checkpointDir: String, outDir: String): StreamingQuery =
    streamDocs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // both output joins consume the hit set -> persist it for the
        // batch so the near-dup ladder (band join + verify) runs once
        val hits = graft.operators.Dedup.nearDupsAgainstIndex(
            batch, idCol, col(textCol), index, threshold)
          .select(col("id_a").as(idCol)).distinct().persist()
        try {
          batch.join(hits, Seq(idCol), "left_anti").write
            .mode("overwrite").parquet(s"$outDir/clean/batch=$batchId")
          batch.join(hits, Seq(idCol), "left_semi").write
            .mode("overwrite").parquet(s"$outDir/flagged/batch=$batchId")
        } finally { hits.unpersist(); () }
      }
      .start()

  /** Streaming perceptual screen for MEDIA with a GROWING index — the
    * incremental-corpus loop at ingest time: each micro-batch decodes
    * its payloads once ([[graft.operators.Multimodal.mediaHashes]]),
    * screens against the persisted signature index — base corpus PLUS
    * every batch admitted so far — through the kind-confined MIH join
    * ([[graft.operators.Multimodal.screenMediaMih]]'s core), writes
    * clean/flagged id sets, and ADMITS the clean signatures back into
    * the index.
    *
    * Exactly-once END-TO-END on the same argument as [[ingest]]:
    * foreachBatch is at-least-once, so every write — including the
    * index admission — lands in a `batch=b<id>` partition directory
    * with OVERWRITE; a replayed batch rewrites its own partitions
    * instead of appending duplicate signatures. The base corpus lives
    * under `batch=base` (partition-discovery keeps the layout uniform),
    * so `read.parquet(indexDir)` always sees base + admissions.
    *
    * Scale: the index is 17 bytes/item and never re-decodes; per batch
    * the join shuffles m rows/index item and m*137 probe rows/batch
    * item — batch-sized work against a corpus-sized index. */
  def screenMediaIngest(streamMedia: DataFrame, indexDir: String,
                        maxDist: Int, checkpointDir: String,
                        outDir: String): StreamingQuery =
    streamMedia.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.operators.{Dedup, Multimodal}
        val spark = batch.sparkSession
        val sigs = Multimodal.mediaHashes(Multimodal.asRecords(batch))
          .persist()
        try {
          val index = Multimodal.loadSignatureIndex(spark, indexDir)
            .select("id", "kind", "sig")
          // both output joins and the admission consume the hit set ->
          // persist so the MIH ladder runs once per micro-batch
          val hits = Dedup.crossSignatureNearDupsMih(index, sigs, maxDist,
              extraKeys = Seq("kind"))
            .select(col("id_b").as("id")).distinct().persist()
          val clean = sigs.join(hits, Seq("id"), "left_anti").persist()
          try {
            clean.select("id", "kind").write.mode("overwrite")
              .parquet(s"$outDir/clean/batch=b$batchId")
            sigs.join(hits, Seq("id"), "left_semi").select("id", "kind")
              .write.mode("overwrite")
              .parquet(s"$outDir/flagged/batch=b$batchId")
            clean.select("id", "kind", "sig").write.mode("overwrite")
              .parquet(s"$indexDir/batch=b$batchId")
          } finally { clean.unpersist(); hits.unpersist(); () }
        } finally { sigs.unpersist(); () }
      }
      .start()

  final case class DomainState(domain: String, firstSeen: java.sql.Timestamp,
                               lastSeen: java.sql.Timestamp, observations: Long)

  /** T4: per-domain first/last-seen tracking — the Cassandra
    * last-write-wins upsert semantics as explicit keyed state. */
  def trackDomainState(obs: Dataset[DomainObs]): Dataset[DomainState] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.domain)
      .mapGroupsWithState[DomainState, DomainState](
        GroupStateTimeout.NoTimeout) {
        case (domain, rows, state: GroupState[DomainState]) =>
          val sorted = rows.toSeq.sortBy(_.obs_ts.getTime)
          val prev = state.getOption
          // out-of-order batches: a late row may predate the stored
          // firstSeen, and the batch max may predate the stored
          // lastSeen — min/max against the prior state, never replace
          val first = prev.map(_.firstSeen).filter(
            _.getTime <= sorted.head.obs_ts.getTime)
            .getOrElse(sorted.head.obs_ts)
          val last = prev.map(_.lastSeen).filter(
            _.getTime >= sorted.last.obs_ts.getTime)
            .getOrElse(sorted.last.obs_ts)
          val next = DomainState(domain, first, last,
            prev.map(_.observations).getOrElse(0L) + sorted.size)
          state.update(next)
          next
      }
  }

  /** Batch compaction to the reference's clustered layout (run after
    * streaming appends): last-write-wins per full key. */
  def compactSubdomains(df: DataFrame, outPath: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val key = Seq("p1", "p2", "p3", "p4", "p5", "p6", "p7")
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(desc("updatedAt"), desc("lastSeen"))
    val compacted = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    OrderedSink.writeSubdomains(compacted, outPath)
  }
}
