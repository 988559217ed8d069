package graft.operators

import graft.SparkTestBase

class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  /** Single-threaded SYMBOL-LEVEL BPE reference: sequences are token
    * VECTORS, merges rewrite whole adjacent symbols greedily left to
    * right — deliberately a different representation from the
    * operator's wrapped-string rewrite, so cross-boundary substring
    * bugs (a pattern matching the SUFFIX of a multi-char symbol)
    * cannot be shared between implementation and reference. */
  private def reference(words: Seq[(String, Long)], merges: Int)
      : (Seq[(Int, String, String, Long)], Map[String, String]) = {
    var seqs = words.map { case (w, c) => (w, w.map(_.toString).toVector, c) }
    def mergeOnce(t: Vector[String], a: String, b: String)
        : Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < t.length) {
        if (i + 1 < t.length && t(i) == a && t(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += t(i); i += 1 }
      }
      out.result()
    }
    val table = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to merges) {
      val counts = seqs.flatMap { case (_, t, c) =>
        t.zip(t.drop(1)).map(p => (s"${p._1} ${p._2}", c))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val (pair, c) = counts.toSeq.minBy { case (p, n) => (-n, p) }
      val Array(a, b) = pair.split(" ", 2)
      table += ((r, pair, a + b, c))
      seqs = seqs.map { case (w, t, n) => (w, mergeOnce(t, a, b), n) }
    }
    (table.result(), seqs.map(t => t._1 -> t._2.mkString(" ")).toMap)
  }

  private def run(words: Seq[(String, Long)], merges: Int) = {
    val (mt, sv) = BpeTrain.train(words.toDF("word", "cnt"), merges)
    (mt.as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1),
      sv.as[(String, String, Long)].collect()
        .map(t => t._1 -> t._2).toMap)
  }

  test("textbook example: repeated pairs merge bottom-up into subwords") {
    val words = Seq(("lower", 5L), ("lowest", 2L), ("newer", 6L),
      ("wider", 3L))
    val (gotT, gotV) = run(words, 4)
    val (refT, refV) = reference(words, 4)
    assert(gotT == refT)
    assert(gotV == refV)
    // 'e r' appears in newer(x2 adjacent? no: n e w e r has one) —
    // e r: lower 5 + newer 6 + wider 3 = 14, the clear first merge
    assert(gotT.head._2 == "e r" && gotT.head._4 == 14L)
  }

  test("ties break toward the lexicographically smaller pair") {
    // 'ab' and 'cd' both appear twice; 'a b' < 'c d'
    val words = Seq(("ab", 2L), ("cd", 2L))
    val (t, _) = run(words, 1)
    assert(t == Seq((1, "a b", "ab", 2L)))
  }

  test("overlapping runs merge leftmost non-overlapping (aaaa -> aa aa)") {
    val words = Seq(("aaaa", 1L))
    val (t, v) = run(words, 1)
    assert(t == Seq((1, "a a", "aa", 3L))) // 3 overlapping pair sites
    assert(v("aaaa") == "aa aa")
  }

  test("matches the reference on random words over a tiny alphabet") {
    val rnd = new scala.util.Random(13)
    val words = (0 until 25).map { _ =>
      (Seq.fill(rnd.nextInt(8) + 1)("abc" (rnd.nextInt(3))).mkString,
        (rnd.nextInt(9) + 1).toLong)
    }.distinct
    val (gotT, gotV) = run(words, 6)
    val (refT, refV) = reference(words, 6)
    assert(gotT == refT)
    assert(gotV == refV)
  }

  test("a merge pair never matches ACROSS symbol boundaries") {
    // round 1 merges (x,a) -> "xa", so "xab" becomes [xa, b]; round 2
    // merges (a,b) — a naive substring rewrite of the space-joined
    // form would then corrupt "xa b" into one symbol "xab" (the 'a'
    // belongs to symbol "xa"); whole-symbol BPE must leave [xa, b]
    val words = Seq(("xa", 50L), ("ab", 40L), ("xab", 1L))
    val (gotT, gotV) = run(words, 2)
    val (refT, refV) = reference(words, 2)
    assert(gotT == refT)
    assert(gotV == refV)
    assert(gotT.map(_._2) == Seq("x a", "a b"))
    assert(gotV("xab") == "xa b", "the 'a b' merge must not reach " +
      "inside the already-merged 'xa' symbol")
  }

  test("running out of pairs is a clear error, not a silent no-op") {
    val ex = intercept[IllegalArgumentException] {
      run(Seq(("a", 3L), ("b", 2L)), 1)
    }
    assert(ex.getMessage.contains("no adjacent pairs"))
  }
}
