package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {

  import spark.implicits._

  test("salted join matches the plain join on skewed data") {
    // 90% of fact rows share one key
    val fact = (1 to 1000).map(i =>
      (if (i <= 900) "hot" else s"k${i % 7}", s"payload$i"))
      .toDF("key", "payload")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("k3", "C"))
      .toDF("key", "attr")

    val plain = fact.join(dim, "key")
      .select("key", "payload", "attr")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(fact, dim, "key", "payload", 8)
      .select("key", "payload", "attr")
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.size == 900 + (1 to 1000).count(i =>
      i > 900 && Seq(1, 2, 3).contains(i % 7)))
  }

  test("salt spreads the hot key across buckets") {
    val fact = (1 to 1000).map(i => ("hot", s"p$i")).toDF("key", "payload")
    val buckets = fact.withColumn("__salt",
        pmod(xxhash64(col("payload")), lit(8L)))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(buckets.length == 8)
    assert(buckets.max < 1000 * 0.3)  // no bucket holds the hot key alone
  }

  test("skew report surfaces the dominant key") {
    val fact = ((1 to 900).map(_ => "hot") ++ (1 to 100).map(i => s"k$i"))
      .toDF("key")
    val top = Skew.keySkewReport(fact, "key", 1).collect()(0)
    assert(top.getString(0) == "hot")
    assert(math.abs(top.getAs[Double]("share") - 0.9) < 1e-9)
  }

  test("skew report carries no empty-partition window (r15 verdict " +
      "#2): the total is a broadcast 1-row agg, so a 10^9-distinct-" +
      "key frame never single-tasks inside its own diagnostic") {
    val fact = ((1 to 900).map(_ => "hot") ++ (1 to 100).map(i => s"k$i"))
      .toDF("key")
    val report = Skew.keySkewReport(fact, "key", topK = 3, partitions = 8)
    val physical = report.queryExecution.executedPlan.toString
    assert(!physical.contains("Window"),
      s"keySkewReport must not plan a WindowExec:\n$physical")
    // and the de-windowed share math is unchanged
    val top = report.collect()(0)
    assert(top.getString(0) == "hot")
    assert(math.abs(top.getAs[Double]("share") - 0.9) < 1e-9)
  }

  test("report recommends salt = ceil(share * partitions), clamped") {
    val fact = ((1 to 900).map(_ => "hot") ++ (1 to 100).map(i => s"k$i"))
      .toDF("key")
    val rec = Skew.keySkewReport(fact, "key", topK = 5, partitions = 8)
      .collect().map(r => r.getString(0) -> r.getInt(3)).toMap
    assert(rec("hot") == 8)            // 0.9 * 8 = 7.2 -> 8, at the clamp
    assert(rec.filterKeys(_ != "hot").values.forall(_ == 1)) // 0.1% keys
    val mild = ((1 to 300).map(_ => "warm") ++ (1 to 700).map(i => s"k$i"))
      .toDF("key")
    val warmRec = Skew.keySkewReport(mild, "key", 1, partitions = 8)
      .collect()(0)
    assert(warmRec.getString(0) == "warm" && warmRec.getInt(3) == 3) // 0.3*8=2.4->3
  }

  test("autoSaltedJoin derives its factor from the report and matches plain join") {
    val fact = (1 to 1000).map(i =>
      (if (i <= 900) "hot" else s"k${i % 7}", s"payload$i"))
      .toDF("key", "payload")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("k3", "C"))
      .toDF("key", "attr")
    val plain = fact.join(dim, "key").select("key", "payload", "attr")
      .collect().map(_.toSeq).toSet
    val autoDf = Skew.autoSaltedJoin(fact, dim, "key", "payload")
    val auto = autoDf.select("key", "payload", "attr")
      .collect().map(_.toSeq).toSet
    assert(auto == plain)
    // the SALTED path must actually activate on the skewed fixture:
    // the derived factor > 1 leaves a __salt join key in the plan
    assert(autoDf.queryExecution.analyzed.toString.contains("__salt"),
      "expected the salted branch on a 90%-hot-key fixture")
    // uniform keys -> recommendation 1 -> plain join path, same result
    val flat = (1 to 800).map(i => (s"k${i % 8}", s"p$i")).toDF("key", "payload")
    val flatDim = (0 until 8).map(i => (s"k$i", s"a$i")).toDF("key", "attr")
    val flatDf = Skew.autoSaltedJoin(flat, flatDim, "key", "payload")
    assert(flatDf.count() == 800)
    assert(!flatDf.queryExecution.analyzed.toString.contains("__salt"),
      "expected the plain branch on a uniform-key fixture")
  }

  test("autoSaltedJoin: sampled measurement and precomputed salt") {
    val fact = (1 to 2000).map(i =>
      (if (i <= 1800) "hot" else s"k${i % 7}", s"payload$i"))
      .toDF("key", "payload")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("k3", "C"))
      .toDF("key", "attr")
    val plain = fact.join(dim, "key").select("key", "payload", "attr")
      .collect().map(_.toSeq).toSet
    // sample-based measurement still finds the 90% key and salts
    val sampled = Skew.autoSaltedJoin(fact, dim, "key", "payload",
      sampleFraction = 0.25)
    assert(sampled.select("key", "payload", "attr")
      .collect().map(_.toSeq).toSet == plain)
    assert(sampled.queryExecution.analyzed.toString.contains("__salt"))
    // precomputed salt skips the measurement scan entirely
    val pre = Skew.autoSaltedJoin(fact, dim, "key", "payload",
      precomputedSalt = Some(6))
    assert(pre.select("key", "payload", "attr")
      .collect().map(_.toSeq).toSet == plain)
    intercept[IllegalArgumentException] {
      Skew.autoSaltedJoin(fact, dim, "key", "payload", sampleFraction = 0.0)
    }
  }

  test("AQE skew join splits the hot partition (plan-asserted)") {
    val conf = spark.conf
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // one key dominates with fat payloads -> its shuffle partition
      // blows past the 32KB threshold and AQE must split it
      val fact = (1 to 20000).map(i =>
        (if (i % 10 != 0) "hot" else s"k${i % 97}", "x" * 60 + i))
        .toDF("key", "payload")
      val dim = (("hot" +: (0 until 97).map(i => s"k$i")).map(k => (k, s"attr_$k")))
        .toDF("key", "attr")
      val joined = fact.join(dim, "key")
      // execute THIS queryExecution (count() would build a new one and
      // leave this plan un-finalized)
      assert(joined.collect().length == 20000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"expected a skew-split shuffle read in:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
