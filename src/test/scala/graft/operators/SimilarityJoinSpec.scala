package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilarityJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(sets: Seq[(Long, Set[String])], t: Double)
      : Set[(Long, Long)] =
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      uni = (sa ++ sb).size
      j = if (uni == 0) 0.0 else (sa & sb).size.toDouble / uni
      if j >= t
    } yield (ia, ib)).toSet

  private def run(sets: Seq[(Long, Set[String])], t: Double)
      : Map[(Long, Long), Double] =
    SimilarityJoin.prefixJaccardSelfJoin(
        sets.map { case (i, s) => (i, s.toSeq) }.toDF("id", "toks"),
        "id", col("toks"), t)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap

  test("equals brute force on random token sets at several thresholds") {
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'z').map(_.toString)
    val sets = (0L until 40L).map { i =>
      i -> Seq.fill(rnd.nextInt(12) + 1)(vocab(rnd.nextInt(vocab.size))).toSet
    }
    for (t <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val got = run(sets, t)
      assert(got.keySet == brute(sets, t), s"t=$t")
      // and the reported jaccard is the exact ratio
      got.foreach { case ((a, b), j) =>
        val (sa, sb) = (sets(a.toInt)._2, sets(b.toInt)._2)
        assert(j == (sa & sb).size.toDouble / (sa ++ sb).size)
      }
    }
  }

  test("identical sets pair at threshold 1.0; disjoint sets never pair") {
    val sets = Seq(0L -> Set("x", "y"), 1L -> Set("x", "y"),
      2L -> Set("p", "q"))
    val got = run(sets, 1.0)
    assert(got.keySet == Set((0L, 1L)))
    assert(got((0L, 1L)) == 1.0)
  }

  test("duplicate tokens in the input column are deduplicated") {
    val df = Seq((0L, Seq("a", "a", "b")), (1L, Seq("b", "a")))
      .toDF("id", "toks")
    val out = SimilarityJoin.prefixJaccardSelfJoin(df, "id", col("toks"), 0.9)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((0L, 1L, 1.0)))
  }

  test("empty token sets produce no pairs") {
    val df = Seq((0L, Seq.empty[String]), (1L, Seq.empty[String]),
      (2L, Seq("a"))).toDF("id", "toks")
    assert(SimilarityJoin.prefixJaccardSelfJoin(df, "id", col("toks"), 0.5)
      .count() == 0)
  }

  test("prefix filtering prunes: candidate work stays below all-pairs") {
    // 60 sets in two similarity families plus distinctive singletons:
    // prefix tokens are the rare per-set discriminators, so the
    // candidate-pair count must be far below C(60,2).
    val sets = (0L until 60L).map { i =>
      val fam = if (i % 2 == 0) Set("c1", "c2", "c3") else Set("d1", "d2", "d3")
      i -> (fam + s"u$i")
    }
    // With threshold 0.75 and |sets|=4, prefix p = 4 - 3 + 1 = 2: the
    // unique token (df=1, first) plus one family token — candidates are
    // within-family only, and the exact verify kills them all (J = 3/5).
    val got = run(sets, 0.75)
    assert(got.isEmpty)
    assert(brute(sets, 0.75).isEmpty)
  }
}
