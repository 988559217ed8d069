package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

class SortedNeighborhoodSpec extends SparkTestBase {
  import spark.implicits._

  private def reference(rows: Seq[(Long, String)], w: Int)
      : Set[(Long, Long)] = {
    val ranked = rows.sortBy(r => (r._2, r._1)).map(_._1).zipWithIndex
    (for {
      (a, ra) <- ranked; (b, rb) <- ranked
      if rb > ra && rb - ra <= w
    } yield (a, b)).toSet
  }

  private def run(rows: Seq[(Long, String)], w: Int): Set[(Long, Long)] =
    SortedNeighborhood.pairs(rows.toDF("id", "k"), "id", "k", w)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("every pair within w ranks, none beyond, lower rank on the left") {
    val rows = Seq(5L -> "e", 1L -> "a", 3L -> "c", 2L -> "b", 4L -> "d")
    for (w <- Seq(1, 2, 4, 10))
      assert(run(rows, w) == reference(rows, w), s"w=$w")
  }

  test("duplicate keys: the (key, id) tiebreak keeps ranks total") {
    val rows = Seq(1L -> "x", 2L -> "x", 3L -> "x", 9L -> "z")
    assert(run(rows, 1) ==
      Set((1L, 2L), (2L, 3L), (3L, 9L)))
  }

  test("block-adjacency covers pairs straddling block boundaries") {
    // ids rank 1..12; w=3 blocks are {0:[1,2,3],1:[4,5,6],...} — the
    // (3,4), (6,7) straddles must all surface
    val rows = (1L to 12L).map(i => i -> f"k$i%02d")
    assert(run(rows, 3) == reference(rows, 3))
  }

  test("matches the reference on random keys at several widths") {
    val rnd = new scala.util.Random(47)
    val rows = (0L until 60L).map(i =>
      i -> Seq.fill(3)("pqrs" (rnd.nextInt(4))).mkString)
    for (w <- Seq(2, 5, 9))
      assert(run(rows, w) == reference(rows, w), s"w=$w")
  }

  test("pairsBy with a derived key equals pairs on the pre-derived input") {
    import org.apache.spark.sql.functions.{lower, regexp_replace}
    // messy keys whose normalized forms REORDER relative to the raw
    // sort (case and punctuation differ): the neighborhood must follow
    // the expression, not the stored column
    val rows = Seq(1L -> "B-2", 2L -> "a#9", 3L -> "A 1", 4L -> "b.0")
    val norm = rows.map { case (id, k) =>
      id -> k.replaceAll("[^A-Za-z0-9]", "").toLowerCase }
    val viaExpr = SortedNeighborhood.pairsBy(rows.toDF("id", "k"),
        col("id"), lower(regexp_replace(col("k"), "[^A-Za-z0-9]", "")), 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(viaExpr == reference(norm, 1) && viaExpr != reference(rows, 1))
  }
}
