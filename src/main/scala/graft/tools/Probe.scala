package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Throwaway measurement main for tuning oracle-gate floors (not part
  * of the driver contract; delete when floors are locked). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = sys.env.get("PROBE_ONLY")
    val docs = Tables.load(spark, dir, "documents")
    val embs = Tables.load(spark, dir, "embeddings")

    if (only.contains("asof")) {
      import graft.sources.Tables
      val events = Tables.load(spark, dir, "events")
        .select(col("event_id"), col("user_id").as("custkey"),
          timestamp_micros(expr("ts div 1000")).as("ev_ts"))
      val snap = Tables.load(spark, dir, "orders")
        .groupBy(col("o_custkey").as("custkey"),
          col("o_orderdate").cast("timestamp").as("o_orderdate"))
        .agg(max("o_totalprice").as("max_price"),
          min("o_totalprice").as("min_price"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          count(lit(1)).as("n_orders"),
          max("o_orderkey").as("max_key"), min("o_orderkey").as("min_key"),
          max("o_orderstatus").as("status_max"),
          max("o_orderpriority").as("prio_max"))
      val vals = Seq("max_price", "min_price", "sum_price", "n_orders",
        "max_key", "min_key", "status_max", "prio_max")
      // wide-left variant: 12 extra payload columns on the left side —
      // the composed form must null-pad all of them onto right rows
      val wideEvents = (1 to 12).foldLeft(events) { (df, i) =>
        df.withColumn(s"pay$i", col("event_id") * i) }
      for (round <- 1 to 3) {
        val tw = System.nanoTime()
        val w1 = graft.query.QueryOps.asofJoin(wideEvents, snap, Seq("custkey"),
          "ev_ts", "o_orderdate", vals).count()
        val tw2 = System.nanoTime()
        val w2 = graft.query.QueryOps.asofJoin(wideEvents, snap, Seq("custkey"),
          "ev_ts", "o_orderdate", vals).count()
        val tw3 = System.nanoTime()
        println(s"[probe] asof_wideleft r$round native=$w1 ${(tw2-tw)/1e9}s composed=$w2 ${(tw3-tw2)/1e9}s")
      }
      for (round <- 1 to 3) {
        val tn = System.nanoTime()
        val n1 = graft.query.QueryOps.asofJoin(events, snap, Seq("custkey"),
          "ev_ts", "o_orderdate", vals).count()
        val tn2 = System.nanoTime()
        val n2 = graft.query.QueryOps.asofJoin(events, snap, Seq("custkey"),
          "ev_ts", "o_orderdate", vals).count()
        val tn3 = System.nanoTime()
        println(s"[probe] asof_wide r$round native=$n1 ${(tn2-tn)/1e9}s composed=$n2 ${(tn3-tn2)/1e9}s")
      }
      spark.stop(); return
    }
    if (only.contains("clusters")) {
      val tc = System.nanoTime()
      val n = graft.query.DedupQueries.dedupClusters(spark, dir).count()
      println(s"[probe] dedupClusters query rows=$n in ${(System.nanoTime()-tc)/1e9}s")
      val tc2 = System.nanoTime()
      graft.query.DedupQueries.dedupClusters(spark, dir).count()
      println(s"[probe] dedupClusters warm in ${(System.nanoTime()-tc2)/1e9}s")
      spark.stop(); return
    }
    if (only.contains("annexact")) {
      // does approx top-5 EXACTLY equal brute-force top-5 (ids)?
      val sub = embs.filter(col("vec_id") < 200)
      val truth = Similarity.bruteForceTopK(sub, "vec_id", "embedding", 999999)
        .select(explode(array(
          struct(col("id_a").as("query_id"), col("id_b").as("neighbor_id"), col("cos")),
          struct(col("id_b").as("query_id"), col("id_a").as("neighbor_id"), col("cos")))).as("p"))
        .select(col("p.query_id"), col("p.neighbor_id"), col("p.cos"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")
            .orderBy(desc("cos"), asc("neighbor_id"))))
        .filter(col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank").localCheckpoint()
      def diff(name: String, approx: DataFrame): Unit = {
        val a = approx.select("query_id", "neighbor_id", "rank")
        val d1 = truth.exceptAll(a).count()
        val d2 = a.exceptAll(truth).count()
        println(s"[probe] $dir $name truth\\approx=$d1 approx\\truth=$d2 " +
          (if (d1 == 0 && d2 == 0) "EXACT" else "DIFFERS"))
      }
      for (tables <- Seq(12, 16, 24, 32))
        diff(s"lsh(4,$tables)", Similarity.lshBucketTopK(
          sub, "vec_id", "embedding", k = 5, numPlanes = 4, tables = tables))
      for (nprobe <- Seq(4, 5, 6))
        diff(s"ivf(8,$nprobe)", Similarity.ivfTopK(
          sub, "vec_id", "embedding", k = 5, nlist = 8, nprobe = nprobe))
      spark.stop(); return
    }
    if (only.contains("pr3")) {
      // q_pagerank fixed-cost check after the doPersist gating
      for (r <- 1 to 4) {
        val t0 = System.nanoTime()
        val n = graft.query.GraphQueries.graphBfs(spark, dir).count()
        val t1 = System.nanoTime()
        val m = graft.query.GraphQueries.pageRankEvents(spark, dir).count()
        val t2 = System.nanoTime()
        println(f"[probe] r$r bfs rows=$n ${(t1 - t0) / 1e9}%.2f s | " +
          f"pagerank rows=$m ${(t2 - t1) / 1e9}%.2f s")
      }
      spark.stop(); return
    }
    if (only.contains("sesswin")) {
      // q_session_window r8 bench anomaly A/B (VERDICT r8 item 1):
      // (a) current path  — normalizeEventTs long round-trip
      //     (NTZ -> cast TZ -> unix_micros*1000) then
      //     timestamp_micros(ts div 1000) inside the query;
      // (b) raw-direct    — read parquet raw, session_window on the
      //     typed column with ONE cast, no long round-trip;
      // (c) scan-only     — no session_window, isolates read+project.
      import org.apache.spark.sql.types.{TimestampType, TimestampNTZType, LongType}
      val raw = spark.read.parquet(s"$dir/events.parquet")
      def tsCol = raw.schema("ts").dataType match {
        case LongType         => timestamp_micros(expr("ts div 1000"))
        case TimestampType    => col("ts")
        case TimestampNTZType => col("ts").cast(TimestampType)
      }
      def current() = graft.query.EventQueries.sessionWindows(spark, dir).count()
      def rawDirect() = raw
        .select(col("user_id"), tsCol.as("ets"))
        .groupBy(col("user_id"), session_window(col("ets"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("s_start"),
          unix_micros(col("session_window.end")).as("s_end"),
          col("n_events"))
        .orderBy("user_id", "s_start").count()
      def scanOnly() = Tables.load(spark, dir, "events")
        .select(col("user_id"),
          timestamp_micros(expr("ts div 1000")).as("ets"))
        .agg(count(lit(1))).count()
      def m3(name: String, f: () => Long): Unit = {
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); val n = f()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"[probe] sesswin $name rows=${times.head._2} " +
          f"min=${times.map(_._1).min}%.3f runs=${times.map(t => f"${t._1}%.3f").mkString(",")}")
      }
      m3("warmup", current _)
      // alternate the two variants so box noise hits both equally
      val cur = collection.mutable.ArrayBuffer[Double]()
      val rd = collection.mutable.ArrayBuffer[Double]()
      for (_ <- 1 to 5) {
        var t0 = System.nanoTime(); current(); cur += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); rawDirect(); rd += (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] sesswin ALT current  min=${cur.min}%.3f runs=${cur.map(t => f"$t%.3f").mkString(",")}")
      println(f"[probe] sesswin ALT rawdirect min=${rd.min}%.3f runs=${rd.map(t => f"$t%.3f").mkString(",")}")
      m3("scanonly", scanOnly _)
      graft.query.EventQueries.sessionWindows(spark, dir).explain("formatted")
      spark.stop(); return
    }
    if (only.contains("scaledemo")) {
      // production-threshold embedding dedup (cos >= 0.9, planes sized
      // so buckets stay sparse): wall must scale ~linearly corpus 1x->10x
      val t0 = System.nanoTime()
      val n = Dedup.embeddingNearDups(embs, "vec_id", "embedding",
        threshold = 0.9, numPlanes = 12, tables = 8, probes = 1).count()
      println(f"[probe] $dir scaledemo(0.9,12,8,p1) pairs=$n " +
        f"in ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"(nvec=${embs.count()})")
      spark.stop(); return
    }
    if (only.contains("multiprobe")) {
      // can multi-probe (Hamming<=1 buckets) reach the q_dedup_embedding
      // exact-equality with fewer tables, and at what wall cost?
      def run(name: String, planes: Int, tables: Int, probes: Int,
              exact: DataFrame): Unit = {
        val t0 = System.nanoTime()
        val got = Dedup.embeddingNearDups(embs, "vec_id", "embedding",
            threshold = 0.45, numPlanes = planes, tables = tables,
            probes = probes)
          .select("id_a", "id_b").localCheckpoint()
        val n = got.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val miss = exact.exceptAll(got).count()
        println(f"[probe] $dir $name pairs=$n missed_vs_exact=$miss in $sec%.2f s")
      }
      val exact = Dedup.embeddingNearDups(embs, "vec_id", "embedding",
          threshold = 0.45, numPlanes = 3, tables = 32)
        .select("id_a", "id_b").localCheckpoint()
      println(s"[probe] $dir exact(3,32,p0) pairs=${exact.count()}")
      for ((p, t, pr) <- Seq((3, 32, 0), (3, 8, 1), (3, 12, 1),
          (3, 16, 1), (4, 10, 1)))
        run(s"lsh($p,$t,p$pr)", p, t, pr, exact)
      spark.stop(); return
    }
    if (only.contains("bandmargin")) {
      // q_contaminate_neardup / q_screen_ingest gate an LSH-candidate
      // result against an exact brute-force oracle; the equivalence
      // holds iff every true pair (bigram J >= 0.9) agrees on >= 8 of
      // 16 r=1 bands (the est_jaccard >= 0.45 prune). Measure the
      // actual agreement floor of the planted pairs.
      val d = docs.filter(col("doc_id") < 1000)
      val sigs = Dedup.minhashSignatures(d, "doc_id", col("text"),
        numHashes = 16, shingleK = 2)
      val sh = d.select(col("doc_id").as("id"),
        Dedup.shingles(col("text"), 2).as("sh"))
      val truePairs = sh.as("a").join(sh.as("b"),
          col("a.id") % 2 === 0 && col("b.id") % 2 === 1)
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          Dedup.jaccard(col("a.sh"), col("b.sh")).as("j"))
        .filter(col("j") >= 0.9)
      val agree = truePairs
        .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
        .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
        .select(col("id_a"), col("id_b"), col("j"),
          expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), b -> b))")
            .as("agreeing_bands"))
      val st = agree.agg(count(lit(1)), min("agreeing_bands"),
        min("j")).collect()(0)
      val hist = agree.groupBy("agreeing_bands").count()
        .orderBy("agreeing_bands").collect()
        .map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" ")
      println(s"[probe] $dir bandmargin true_pairs=${st.getLong(0)} " +
        s"min_agreeing_bands=${st.getInt(1)} (floor 8) min_j=${st.getDouble(2)} hist=$hist")
      spark.stop(); return
    }
    if (only.contains("ivfrank")) {
      // margin for the per-row boolean gate: what exact-rank do IVF's
      // emitted neighbors reach, worst case, at this SF?
      val sub = embs.filter(col("vec_id") < 200)
      val allRanks = Similarity.bruteForcePairs(sub, "vec_id", "embedding")
        .select(explode(array(
          struct(col("id_a").as("query_id"), col("id_b").as("neighbor_id"), col("cos")),
          struct(col("id_b").as("query_id"), col("id_a").as("neighbor_id"), col("cos")))).as("p"))
        .select(col("p.query_id"), col("p.neighbor_id"), col("p.cos"))
        .withColumn("exact_rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")
            .orderBy(desc("cos"), asc("neighbor_id"))))
        .select("query_id", "neighbor_id", "exact_rank").localCheckpoint()
      val ivf = Similarity.ivfTopK(sub, "vec_id", "embedding",
        k = 5, nlist = 8, nprobe = 4)
      val joined = ivf.select("query_id", "neighbor_id")
        .join(allRanks, Seq("query_id", "neighbor_id"))
      val stats = joined.agg(count(lit(1)).as("n"), max("exact_rank"),
        expr("percentile(exact_rank, 0.99)")).collect()(0)
      println(s"[probe] $dir ivf(8,4) rows=${stats.getLong(0)} " +
        s"max_exact_rank=${stats.getInt(1)} p99=${stats.getDouble(2)}")
      spark.stop(); return
    }
    // minhash bigram at 0.5 and unigram at 0.9: pair counts
    val mb = Dedup.minhashNearDups(docs, "doc_id", col("text"),
      threshold = 0.5, numHashes = 16, bands = 16, shingleK = 2).count()
    println(s"[probe] minhash bigram@0.5 pairs = $mb (truth 25)")
    val t0 = System.nanoTime()
    val mu = Dedup.minhashNearDups(docs, "doc_id", col("text"),
      threshold = 0.9, numHashes = 96, bands = 16, shingleK = 1).count()
    println(s"[probe] minhash unigram@0.9 r6 pairs = $mu (truth 9020) in ${(System.nanoTime()-t0)/1e9}s")
    val t1 = System.nanoTime()
    val pairs = Dedup.minhashNearDups(docs.filter(col("doc_id") < 1000),
      "doc_id", col("text"), threshold = 0.9, numHashes = 96, bands = 16,
      shingleK = 1).localCheckpoint()
    val np = pairs.count()
    val t2 = System.nanoTime()
    println(s"[probe] cluster pair-gen = $np pairs in ${(t2-t1)/1e9}s")
    val cl = Dedup.nearDupClusters(pairs).count()
    println(s"[probe] clustering rows = $cl in ${(System.nanoTime()-t2)/1e9}s")

    // embedding LSH pair recall at 0.45 for parameter grid
    for ((planes, tables) <- Seq((3, 12), (3, 16), (4, 12), (4, 16), (4, 20))) {
      val n = Dedup.embeddingNearDups(embs, "vec_id", "embedding",
        threshold = 0.45, numPlanes = planes, tables = tables).count()
      println(s"[probe] embdedup@0.45 planes=$planes tables=$tables pairs = $n (truth 14)")
    }

    // per-query recall@5: LSH and IVF vs brute force on vec_id < 200
    val sub = embs.filter(col("vec_id") < 200)
    val truth = Similarity.bruteForcePairs(sub, "vec_id", "embedding")
      .select(explode(array(
        struct(col("id_a").as("query_id"), col("id_b").as("neighbor_id"), col("cos")),
        struct(col("id_b").as("query_id"), col("id_a").as("neighbor_id"), col("cos")))).as("p"))
      .select(col("p.query_id"), col("p.neighbor_id"), col("p.cos"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(desc("cos"), asc("neighbor_id"))))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"))

    def recallStats(name: String, approx: DataFrame): Unit = {
      val hits = approx.select("query_id", "neighbor_id")
        .join(truth, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("h"))
      val per = truth.select("query_id").distinct()
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"), coalesce(col("h"), lit(0L)).as("h"))
      val stats = per.agg(min("h").as("min_h"), avg("h").as("avg_h"),
        count(lit(1)).as("n")).collect()(0)
      val hist = per.groupBy("h").count().orderBy("h").collect()
        .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
      println(s"[probe] $name recall@5: min=${stats.getLong(0)} " +
        s"avg=${stats.getDouble(1)} n=${stats.getLong(2)} hist=$hist")
    }

    recallStats("lsh(6,6)", Similarity.lshBucketTopK(sub, "vec_id", "embedding",
      k = 5, numPlanes = 6, tables = 6))
    recallStats("lsh(4,12)", Similarity.lshBucketTopK(sub, "vec_id", "embedding",
      k = 5, numPlanes = 4, tables = 12))
    recallStats("ivf(8,2)", Similarity.ivfTopK(sub, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 2))
    recallStats("ivf(8,4)", Similarity.ivfTopK(sub, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 4))
    recallStats("ivfpq(8,4,m8k16,r32)", Similarity.ivfPqTopK(sub,
      "vec_id", "embedding", k = 5, nlist = 8, nprobe = 4, m = 8,
      ksub = 16, rerank = 32))
    recallStats("ivfpq(8,4,m8k16,r64)", Similarity.ivfPqTopK(sub,
      "vec_id", "embedding", k = 5, nlist = 8, nprobe = 4, m = 8,
      ksub = 16, rerank = 64))
    recallStats("ivfpq(8,4,m16k16,r48)", Similarity.ivfPqTopK(sub,
      "vec_id", "embedding", k = 5, nlist = 8, nprobe = 4, m = 16,
      ksub = 16, rerank = 48))
    spark.stop()
  }
}
