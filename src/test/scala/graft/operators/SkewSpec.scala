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
}
