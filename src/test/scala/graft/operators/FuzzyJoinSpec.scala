package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.{GenForAll, SparkTestBase}

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deletionKeys = the string plus every single-char deletion") {
    val got = Seq("abc").toDF("s")
      .select(FuzzyJoin.deletionKeys(col("s"))).as[Seq[String]]
      .head()
    assert(got.toSet == Set("abc", "bc", "ac", "ab"))
    val empty = Seq("").toDF("s")
      .select(FuzzyJoin.deletionKeys(col("s"))).as[Seq[String]]
      .head()
    assert(empty == Seq(""))
  }

  test("blocked join = brute-force lev<=1 join on random string sets") {
    // tiny alphabet + short strings maximize near-collisions; empty
    // strings and duplicates included
    val word = for {
      n <- Gen.choose(0, 5)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val gen = for {
      ls <- Gen.listOfN(12, word)
      rs <- Gen.listOfN(12, word)
    } yield (ls.distinct, rs.distinct)
    GenForAll.forAll(gen, n = 60) { case (ls, rs) =>
      if (ls.nonEmpty && rs.nonEmpty) {
        val left = ls.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("lid", "lstr")
        val right = rs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("rid", "rstr")
        val got = FuzzyJoin.lev1Join(left, "lid", "lstr",
            right, "rid", "rstr")
          .select("lstr", "rstr").as[(String, String)].collect().toSet
        val want = (for {
          l <- ls; r <- rs; if lev(l, r) <= 1
        } yield (l, r)).toSet
        assert(got == want, s"left=$ls right=$rs")
      }
    }
  }

  test("k=2 blocked join = brute-force lev<=2 join on random strings") {
    val word = for {
      n <- Gen.choose(0, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b'))
    } yield cs.mkString
    val gen = for {
      ls <- Gen.listOfN(8, word)
      rs <- Gen.listOfN(8, word)
    } yield (ls.distinct, rs.distinct)
    GenForAll.forAll(gen, n = 40) { case (ls, rs) =>
      if (ls.nonEmpty && rs.nonEmpty) {
        val left = ls.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("lid", "lstr")
        val right = rs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
          .toDF("rid", "rstr")
        val got = FuzzyJoin.levJoin(left, "lid", "lstr",
            right, "rid", "rstr", k = 2)
          .select("lstr", "rstr").as[(String, String)].collect().toSet
        val want = (for {
          l <- ls; r <- rs; if lev(l, r) <= 2
        } yield (l, r)).toSet
        assert(got == want, s"left=$ls right=$rs")
      }
    }
  }

  test("depth-2 deletion keys: {s} ∪ del1 ∪ del2, deduplicated") {
    val got = Seq("abcd").toDF("s")
      .select(FuzzyJoin.deletionKeysK(col("s"), 2)).as[Seq[String]]
      .head().toSet
    val del1 = Set("bcd", "acd", "abd", "abc")
    val del2 = Set("cd", "bd", "bc", "ad", "ac", "ab")
    assert(got == Set("abcd") ++ del1 ++ del2)
    // short strings: no pair deletions possible, no error
    assert(Seq("a").toDF("s")
      .select(FuzzyJoin.deletionKeysK(col("s"), 2)).as[Seq[String]]
      .head().toSet == Set("a", ""))
  }

  test("native del-hashes = xxhash64 over the HOF deletion keys") {
    val word = for {
      n <- Gen.choose(0, 8)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'é', 'ß', '水', '1'))
    } yield cs.mkString
    GenForAll.forAll(word, n = 150) { s =>
      for (k <- Seq(1, 2)) {
        val native = Seq(s).toDF("s")
          .select(graft.plans.GraftExtensions.nativeFn(
            "graft_del_hashes", col("s"), lit(k)))
          .as[Seq[Long]].head().toSet
        val spec = Seq(s).toDF("s")
          .select(transform(FuzzyJoin.deletionKeysK(col("s"), k),
            v => xxhash64(v)))
          .as[Seq[Long]].head().toSet
        assert(native == spec, s"s=$s k=$k")
      }
    }
  }

  test("reported distance is the exact levenshtein distance") {
    val left = Seq((1L, "kitten"), (2L, "abc")).toDF("lid", "lstr")
    val right = Seq((10L, "kitten"), (11L, "kittex"), (12L, "abcd"),
      (13L, "xyz")).toDF("rid", "rstr")
    val got = FuzzyJoin.lev1Join(left, "lid", "lstr", right, "rid", "rstr")
      .select("lid", "rid", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 10L, 0), (1L, 11L, 1), (2L, 12L, 1)))
  }

  test("empty sides yield empty joins, no error") {
    val empty = Seq.empty[(Long, String)].toDF("lid", "lstr")
    val some = Seq((1L, "abc")).toDF("rid", "rstr")
    assert(FuzzyJoin.lev1Join(empty, "lid", "lstr",
      some, "rid", "rstr").count() == 0)
  }

  test("maxBucket caps fan-out and only ever drops pairs") {
    // 60 identical left strings: the shared keys form one huge bucket
    val left = (1 to 60).map(i => (i.toLong, "aaaa")).toDF("lid", "lstr")
    val right = Seq((1L, "aaab")).toDF("rid", "rstr")
    val full = FuzzyJoin.lev1Join(left, "lid", "lstr", right, "rid", "rstr")
    assert(full.count() == 60)
    val capped = FuzzyJoin.lev1Join(left, "lid", "lstr",
      right, "rid", "rstr", maxBucket = 10)
    assert(capped.count() == 0)
  }
}
