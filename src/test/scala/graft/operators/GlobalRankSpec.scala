package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

class GlobalRankSpec extends SparkTestBase {
  import spark.implicits._

  test("ranks equal the sorted position, any input partitioning") {
    val rows = Seq(("c", 3.0), ("a", 1.0), ("b", 2.0), ("d", 4.0),
      ("e", 0.5), ("f", 9.0), ("g", 7.5))
    for (parts <- Seq(1, 2, 8)) {
      val got = GlobalRank.withRowNumber(
          rows.toDF("k", "v").repartition(parts),
          Seq(col("v"), col("k")), "rn")
        .select("k", "rn").as[(String, Long)].collect().toMap
      val want = rows.sortBy(r => (r._2, r._1)).map(_._1)
        .zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("large input: contiguous 1..n ranks, order preserved") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 20000).map(i => (i.toLong, rnd.nextDouble()))
    val got = GlobalRank.withRowNumber(rows.toDF("id", "v"),
        Seq(col("v"), col("id")), "rn")
      .select("id", "v", "rn").as[(Long, Double, Long)].collect()
    assert(got.map(_._3).sorted.toSeq == (1L to 20000L))
    val byRank = got.sortBy(_._3)
    assert(byRank.map(r => (r._2, r._1)).toSeq ==
      rows.map(r => (r._2, r._1)).sortBy(identity))
  }

  test("ties on the full key get distinct consecutive ranks") {
    val rows = Seq(("x", 1.0), ("x", 1.0), ("y", 2.0))
    val got = GlobalRank.withRowNumber(rows.toDF("k", "v"),
        Seq(col("v"), col("k")), "rn")
      .select("k", "rn").as[(String, Long)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_._1).toSeq == Seq("x", "x", "y"))
  }
}
