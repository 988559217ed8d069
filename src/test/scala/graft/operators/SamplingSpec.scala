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
