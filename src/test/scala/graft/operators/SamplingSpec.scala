package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val corpus = (0 until 1000)
    .map(i => (i.toLong, s"src${i % 4}", 50L + i % 200))
    .toDF("id", "source", "tokens")

  test("bernoulli is deterministic, rate-accurate, and monotone in rate") {
    val s10 = Sampling.bernoulli(corpus, col("id"), 0.1)
      .select("id").as[Long].collect().toSet
    val s10b = Sampling.bernoulli(corpus, col("id"), 0.1)
      .select("id").as[Long].collect().toSet
    assert(s10 == s10b, "same rows every run")
    assert(s10.size > 60 && s10.size < 140, s"~10% of 1000, got ${s10.size}")
    val s50 = Sampling.bernoulli(corpus, col("id"), 0.5)
      .select("id").as[Long].collect().toSet
    assert(s10.subsetOf(s50), "threshold coins nest across rates")
    assert(Sampling.bernoulli(corpus, col("id"), 0.0).count() == 0)
    assert(Sampling.bernoulli(corpus, col("id"), 1.0).count() == 1000)
  }

  test("hexThresholdCol clamps ultra-small positive rates to coin 0 " +
      "instead of the 16-char %08x of -1 that selects ALL rows " +
      "(advice r15), and keeps the documented edge rates") {
    val rates = Seq(-0.5, 0.0, 1e-12, 1.0 / (1L << 34).toDouble,
      1.0 / (1L << 32).toDouble, 0.5, 1.0, 2.0).toDF("rate")
    val got = rates
      .select(Sampling.hexThresholdCol(col("rate")).as("t"))
      .collect().map(_.getString(0))
    assert(got(0) == "/" && got(1) == "/", "rates <= 0 select nothing")
    // positive rates that round(rate * 2^32) to zero clamp to the
    // smallest real threshold (keep coins == 00000000) — a SUPERSET
    // of the requested draw, never the select-everything degenerate
    assert(got(2) == "00000000" && got(3) == "00000000", got.toSeq)
    assert(got(4) == "00000000", "rate 2^-32 keeps exactly coin 0")
    assert(got.forall(_.length <= 8), s"8-hex-char domain: ${got.toSeq}")
    assert(got(6) == "ffffffff" && got(7) == "ffffffff")
    // scalar twin agrees on the representable rates
    assert(Sampling.hexThreshold(0.5) == got(5))
  }

  test("stratifiedN draws exactly n per stratum (capped by group size)") {
    val out = Sampling.stratifiedN(corpus, col("source"), col("id"), 30)
    val sizes = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.toSet == Set(30L))
    // small stratum: n larger than the group keeps the whole group
    val tiny = Sampling.stratifiedN(
      corpus.filter(col("id") < 10), col("source"), col("id"), 30)
    assert(tiny.count() == 10)
    // deterministic draw
    val a = out.select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratifiedN(corpus, col("source"), col("id"), 30)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("stratifiedN threshold form (default) == the full-shuffle " +
      "window form, incl. a hot stratum, tiny strata, and null strata") {
    // hot stratum: 90% of rows in one group — the r15 skew-audit case
    val skewed = spark.range(2000).select(col("id"),
      when(col("id") % 10 === 0,
          concat(lit("small"), (col("id") % 3).cast("string")))
        .when(col("id") % 100 === 7, lit(null).cast("string"))
        .otherwise(lit("hot")).as("source"))
    for (n <- Seq(1, 5, 40)) {
      def run(viaWindow: Boolean) =
        Sampling.stratifiedNImpl(skewed, col("source"), col("id"), n,
            oversample = 8.0, floorDraws = 50.0, viaWindow = viaWindow)
          .select("id").as[Long].collect().sorted.toSeq
      assert(run(viaWindow = false) == run(viaWindow = true), s"n=$n")
    }
    // parameter floor: a cutoff that could miss a stratum entirely is
    // rejected up front (zero-survivor strata carry no assert row)
    val bad = intercept[IllegalArgumentException] {
      Sampling.stratifiedN(skewed, col("source"), col("id"), 5,
        oversample = 0.0, floorDraws = 0.0)
    }
    assert(bad.getMessage.contains("vanish"))
    // in-plan exactness guard: ~25 expected survivors per stratum but
    // n = 60 wanted from the 200-row strata -> certain shortfall,
    // loud failure naming oversample (deterministic: md5 coins)
    val e = intercept[Exception] {
      Sampling.stratifiedN(skewed, col("source"), col("id"), 60,
        oversample = 0.0, floorDraws = 25.0).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("oversample")), msgs(e))
  }

  test("mixCorpora applies per-source rates and drops absent sources") {
    val out = Sampling.mixCorpora(corpus, col("source"), col("id"),
      Map("src0" -> 1.0, "src1" -> 0.2))
    val bySrc = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") == 250, "rate 1.0 keeps the whole source")
    assert(bySrc.getOrElse("src1", 0L) > 20 &&
      bySrc("src1") < 80, s"~20% of 250: ${bySrc.get("src1")}")
    assert(!bySrc.contains("src2") && !bySrc.contains("src3"),
      "unlisted sources drop")
  }

  test("packTokenBudget: chunk of a row = the budget window of its last token") {
    val out = Sampling.packTokenBudget(corpus, col("source"), col("id"),
        col("tokens"), budget = 1000)
      .select("id", "source", "tokens", "chunk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    out.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._1)
      var cum = 0L
      ordered.foreach { case (_, _, tokens, chunk) =>
        cum += tokens
        assert(chunk == (cum + 999) / 1000 - 1,
          "chunk must index the stream window holding the row's last token")
      }
      // chunk ids are non-decreasing in id order and start at 0
      assert(ordered.head._4 == 0)
      assert(ordered.map(_._4).sliding(2).forall(
        p => p.length < 2 || p(0) <= p(1)))
    }
  }

  test("hashSplit partitions every row, rate-accurately and stably") {
    val out = Sampling.hashSplit(corpus, col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(out.length == 1000, "rates summing to 1 keep every row")
    val sizes = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes("train") > 740 && sizes("train") < 860, sizes.toString)
    assert(sizes("val") > 60 && sizes("val") < 140, sizes.toString)
    assert(sizes("test") > 60 && sizes("test") < 140, sizes.toString)
    // the split of a row never depends on the rest of the corpus
    val sub = Sampling.hashSplit(corpus.filter(col("id") < 100), col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = out.toMap
    assert(sub.forall { case (id, sp) => full(id) == sp })
    // rates summing below 1 drop the remainder
    val half = Sampling.hashSplit(corpus, col("id"), Seq("a" -> 0.5))
    assert(half.count() > 400 && half.count() < 600)
  }

  test("leakFreeSplit co-assigns near-dup clusters; singletons match hashSplit") {
    // components {1,2,3} (rep 1) and {10,11} (rep 10); 20, 21 singleton
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster")
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L).toDF("id")
    val out = Sampling.leakFreeSplit(docs, col("id"), clusters,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "cluster", "split").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.size == 7, "rates summing to 1 keep every row")
    // a whole near-dup family lands in ONE split
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(out(10L) == out(11L))
    // singletons are their own representative: identical to the plain
    // hashSplit of their id
    val plain = Sampling.hashSplit(docs, col("id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(20L) == ((20L, plain(20L))))
    assert(out(21L) == ((21L, plain(21L))))
    // and a clustered doc follows its REPRESENTATIVE's coin, not its own
    assert(out(2L)._2 == plain(1L))
  }

  test("prioritySample draws k by w/u priority, weight-biased and deterministic") {
    val weighted = corpus.withColumn("w",
      when(col("id") < 100, lit(1000L)).otherwise(lit(1L)))
    val got = Sampling.prioritySample(weighted, col("id"), col("w"), 50)
      .select("id").as[Long].collect().toSet
    assert(got.size == 50)
    // the 100 heavy rows (1000x weight) should dominate the draw
    assert(got.count(_ < 100) > 35, s"heavy keys under-drawn: $got")
    // exact agreement with a driver-side recomputation of the formula
    val hex = corpus.select(col("id"),
        conv(substring(md5(col("id").cast("string").cast("binary")), 1, 8),
          16, 10).cast("long").as("u"))
      .as[(Long, Long)].collect().toMap
    val expected = weighted.select("id", "w").as[(Long, Long)].collect()
      .map { case (id, w) => (id, w.toDouble / (hex(id) + 1L)) }
      .sortBy { case (id, pri) => (-pri, id) }.take(50).map(_._1).toSet
    assert(got == expected)
    // rerun is identical; null/non-positive weights never selected
    val again = Sampling.prioritySample(weighted, col("id"), col("w"), 50)
      .select("id").as[Long].collect().toSet
    assert(again == got)
    val zeroed = weighted.withColumn("w",
      when(col("id") % 2 === 0, col("w")).otherwise(lit(0L)))
    val evens = Sampling.prioritySample(zeroed, col("id"), col("w"), 600)
      .select("id").as[Long].collect()
    assert(evens.length == 500 && evens.forall(_ % 2 == 0))
  }

  test("temperatureResample keeps max(1, floor(n^alpha)) smallest-order rows per stratum") {
    // strata with very different sizes: 900 / 90 / 9 / 1
    val skewed = ((0 until 900).map(i => (s"en", i.toLong)) ++
      (0 until 90).map(i => (s"de", i.toLong)) ++
      (0 until 9).map(i => (s"sw", i.toLong)) ++
      Seq(("io", 0L))).toDF("lang", "id")
    val out = Sampling.temperatureResample(skewed, col("lang"), col("id"), 0.5)
      .select("lang", "id").as[(String, Long)].collect()
    val byLang = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    assert(byLang("en") == (0L until 30L))  // floor(sqrt(900)) = 30
    assert(byLang("de") == (0L until 9L))   // floor(sqrt(90))  = 9
    assert(byLang("sw") == (0L until 3L))   // floor(sqrt(9))   = 3
    assert(byLang("io") == Seq(0L))         // max(1, floor(1)) = 1
    // alpha = 1 is the identity mixture
    assert(Sampling.temperatureResample(skewed, col("lang"), col("id"), 1.0)
      .count() == 1000)
  }

  test("temperatureResample keeps NULL-stratum rows as a real group") {
    val withNull = (Seq(("en", 0L), ("en", 1L), ("en", 2L), ("en", 3L)) ++
      Seq((null.asInstanceOf[String], 0L), (null, 1L), (null, 2L),
        (null, 3L))).toDF("lang", "id")
    val out = Sampling.temperatureResample(withNull, col("lang"),
        col("id"), 0.5)
      .select("lang", "id").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1)))
    // floor(sqrt(4)) = 2 rows survive per stratum — INCLUDING null
    assert(out.count(_._1.isEmpty) == 2, out.toSeq.toString)
    assert(out.count(_._1.contains("en")) == 2)
  }

  test("temperatureResample salted two-stage form (default) == the " +
      "single stratum window (legacy), incl. a hot stratum, a " +
      "1-row stratum, and a null stratum, across salt widths") {
    val skewed = ((0 until 900).map(i => ("hot", i.toLong * 7 % 900)) ++
      (0 until 90).map(i => ("de", i.toLong)) ++
      Seq(("io", 0L), (null.asInstanceOf[String], 0L),
        (null.asInstanceOf[String], 1L))).toDF("lang", "id")
    for (alpha <- Seq(0.3, 0.5, 1.0); s <- Seq(1, 4, 32)) {
      def run(viaWindow: Boolean) =
        Sampling.temperatureResampleImpl(skewed, col("lang"), col("id"),
            alpha, saltBuckets = s, viaWindow = viaWindow)
          .select("lang", "id").collect()
          .map(r => (Option(r.getString(0)), r.getLong(1))).toSet
      assert(run(viaWindow = false) == run(viaWindow = true),
        s"alpha=$alpha salt=$s")
    }
  }

  test("nucleusCut keeps the smallest prefix reaching pct% of stratum " +
      "mass with the exact running cum, == the legacy stratum-window " +
      "form, incl. heavy mass ties, a hot stratum, zero masses, and " +
      "null stratum/mass rows") {
    val rnd = new scala.util.Random(61)
    // hot stratum with heavy ties (few distinct masses), a tiny
    // stratum, zero-mass rows, a null stratum, and null-mass rows
    val rows = (0L until 800L).map(i =>
        ("hot", 1L + rnd.nextInt(6).toLong * 10, i)) ++
      (0L until 12L).map(i => ("tiny", 100L + i, i)) ++
      Seq(("hot", 0L, 9001L), ("hot", 0L, 9002L),
        (null.asInstanceOf[String], 50L, 1L), (null, 30L, 2L),
        ("tiny", -1L, 9000L)) // -1 sentinel swapped to null below
    val df = rows.toDF("lang", "mass", "doc")
      .withColumn("mass",
        when(col("mass") === -1L, lit(null)).otherwise(col("mass")))
    for (pct <- Seq(50, 80, 100)) {
      def run(viaWindow: Boolean) =
        Sampling.nucleusCutImpl(df, col("lang"), col("mass"),
            col("doc"), pct, viaWindow = viaWindow)
          .collect()
          .map(r => (Option(r.getString(0)), Option(r.get(1)),
            r.getLong(2)) -> r.getLong(3)).toMap
      val fast = run(viaWindow = false)
      assert(fast == run(viaWindow = true), s"pct=$pct")
      if (pct == 80) {
        // sanity against first principles on the tiny stratum:
        // masses 100..111, total 1266; keep desc-prefix until
        // cum_before*100 >= 80*total
        val tiny = fast.filter(_._1._1.contains("tiny")).toSeq
          .sortBy(-_._1._3)
        val masses = (0L until 12L).map(100L + _).sortBy(identity).reverse
        val total = masses.sum
        val expectKeep = masses.indices.takeWhile(i =>
          masses.take(i).sum * 100 < 80 * total).map(masses(_))
        assert(tiny.map(_._1._2.get.asInstanceOf[Long]).sorted ==
          expectKeep.sorted, s"tiny kept ${tiny.map(_._1)}")
      }
    }
  }

  test("nucleusCut fails LOUDLY on a negative mass instead of " +
      "silently mis-dropping value classes (the pre-filter is " +
      "unsound there)") {
    val df = Seq(("en", 5L, 1L), ("en", -3L, 2L), ("de", 4L, 3L))
      .toDF("lang", "mass", "doc")
    val e = intercept[Exception] {
      Sampling.nucleusCut(df, col("lang"), col("mass"), col("doc"), 80)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("non-negative")), msgs(e))
  }

  test("temperatureResample == an independent in-memory reference " +
      "model over random corpora (both Spark forms could share a bug; " +
      "the model can't)") {
    val rnd = new scala.util.Random(997)
    for (trial <- 0 until 3; alpha <- Seq(0.3, 0.5, 0.8)) {
      val langs = Array("en", "de", "sw", null)
      val rows = (0 until 400).map { i =>
        (langs(rnd.nextInt(langs.length)), rnd.nextLong())
      }.distinct // unique orders: ties would make the draw ambiguous
      val df = rows.toDF("lang", "ord")
      val got = Sampling.temperatureResample(df, col("lang"),
          col("ord"), alpha)
        .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
      // .toSeq before flatMap: flatMap on a Map key-dedups 2-tuple
      // results, silently collapsing each stratum's k rows to one
      val want = rows.map { case (l, o) => (Option(l), o) }
        .groupBy(_._1).toSeq.flatMap { case (_, rs) =>
          // sqrt for alpha = 0.5, like the operator: pow is only
          // 1-ulp-accurate and can flip the floor at perfect squares
          val raw = if (alpha == 0.5) math.sqrt(rs.size.toDouble)
            else math.pow(rs.size.toDouble, alpha)
          val k = math.max(1L, math.floor(raw).toLong)
          rs.sortBy(_._2).take(k.toInt)
        }.toSet
      assert(got == want, s"trial=$trial alpha=$alpha")
    }
  }

  test("nucleusCut == an independent in-memory reference model over " +
      "random corpora with heavy ties") {
    val rnd = new scala.util.Random(331)
    for (trial <- 0 until 3; pct <- Seq(30, 80, 100)) {
      val langs = Array("en", "de", null)
      val rows = (0L until 300L).map { i =>
        (langs(rnd.nextInt(langs.length)),
          // heavy ties: few distinct masses, incl. zeros
          rnd.nextInt(7).toLong * 10, i)
      }
      val df = rows.toDF("lang", "mass", "doc")
      val got = Sampling.nucleusCut(df, col("lang"), col("mass"),
          col("doc"), pct)
        .collect()
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))
          -> r.getLong(3)).toMap
      val want = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        val sorted = rs.sortBy(r => (-r._2, r._3))
        val total = sorted.map(_._2).sum
        var cum = 0L
        sorted.flatMap { case (l, m, id) =>
          val before = cum; cum += m
          if (before * 100 < total * pct)
            Some((Option(l), m, id) -> (before + m))
          else None
        }
      }.toMap
      assert(got == want, s"trial=$trial pct=$pct")
    }
  }

  test("scalar hexThreshold clamps tiny positive rates like the column " +
      "form (advice r16): 1e-12 keeps only coin 00000000, never the " +
      "16-char %08x of -1 that selected ALL rows") {
    assert(Sampling.hexThreshold(1e-12) == "00000000")
    assert(Sampling.hexThreshold(1.0 / (1L << 34).toDouble) == "00000000")
    assert(Sampling.hexThreshold(1.0 / (1L << 32).toDouble) == "00000000")
    // behavioral: the scalar form feeds bernoulli/mixCorpora/hashSplit —
    // a tiny rate must select ~0 of 1000 rows, not all of them
    assert(Sampling.bernoulli(corpus, col("id"), 1e-12).count() <= 1)
    assert(Sampling.mixCorpora(corpus, col("source"), col("id"),
      Map("src0" -> 1e-12, "src1" -> 1.0)).count() <= 250 + 1)
  }

  test("temperatureResample alpha=1 short-circuits to the input " +
      "unchanged — no window anywhere in the plan (advice r16: k=n " +
      "would regress stage 2 to the corpus-sized stratum window)") {
    val out = Sampling.temperatureResample(corpus, col("source"),
      col("id"), 1.0)
    assert(out.count() == 1000)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("window"), plan)
  }

  test("default salt width caps at min(shuffle.partitions, 1024) — a " +
      "cluster-scale partition count must not re-inflate the stage-2 " +
      "bound (verdict r16 #2)") {
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "8192")
      val plan = Sampling.temperatureResample(corpus, col("source"),
        col("id"), 0.5).queryExecution.analyzed.toString
      assert(plan.contains("1024"), plan)
      assert(!plan.contains("8192"), plan)
      // an explicit saltBuckets is always honored verbatim
      val explicitPlan = Sampling.temperatureResampleImpl(corpus,
          col("source"), col("id"), 0.5, saltBuckets = 7,
          viaWindow = false)
        .queryExecution.analyzed.toString
      assert(explicitPlan.contains(", 7)"), explicitPlan)
    } finally spark.conf.set(key, old)
  }

  test("shuffleShards assigns every row a shard and a dense in-shard position") {
    val out = Sampling.shuffleShards(corpus, col("id"), 8, "s1")
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 1000)
    assert(out.map(_._2).toSet.subsetOf((0L until 8L).toSet))
    out.groupBy(_._2).foreach { case (_, rows) =>
      // positions are exactly 0..size-1 within each shard
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // deterministic under re-run, different under a different seed
    val again = Sampling.shuffleShards(corpus, col("id"), 8, "s1")
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    val other = Sampling.shuffleShards(corpus, col("id"), 8, "s2")
      .select("id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mine = out.map(t => t._1 -> t._2).toMap
    assert(corpus.count() > mine.count(kv => other(kv._1) == kv._2),
      "a new seed reshuffles shard membership")
  }
}
