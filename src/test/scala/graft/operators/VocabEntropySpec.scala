package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

class VocabEntropySpec extends SparkTestBase {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("vocab ranks by frequency then lexicographically; OOV encodes 0") {
    val df = docsDf(
      (1L, "b b b a a c"),
      (2L, "a b zz"))
    val (vocab, encoded) =
      TextAnalysis.vocabEncode(df, "doc_id", col("text"), maxVocab = 3)
    // counts: b=4, a=3, c=1, zz=1 -> c beats zz lexicographically at rank 3
    assert(vocab.as[(String, Long)].collect().toMap ==
      Map("b" -> 1L, "a" -> 2L, "c" -> 3L))
    val enc = encoded.as[(Long, Long, Long)].collect().toSet
    assert(enc == Set(
      (1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 2L),
      (1L, 5L, 2L), (1L, 6L, 3L),
      (2L, 1L, 2L), (2L, 2L, 1L), (2L, 3L, 0L))) // zz -> OOV 0
  }

  test("the vocab cap binds exactly and positions are 1-based") {
    val df = docsDf((7L, "x y"))
    val (vocab, encoded) =
      TextAnalysis.vocabEncode(df, "doc_id", col("text"), maxVocab = 1)
    assert(vocab.as[(String, Long)].collect().toSeq == Seq(("x", 1L)))
    assert(encoded.as[(Long, Long, Long)].collect().toSet ==
      Set((7L, 1L, 1L), (7L, 2L, 0L)))
  }

  test("token entropy: uniform, constant, and known mixed cases") {
    val df = docsDf(
      (1L, "a b c d"),     // uniform over 4 -> 2 bits
      (2L, "a a a a"),     // constant -> 0 bits
      (3L, "a a b"))       // H = log2(3) - (2/3) = 0.918296
    val got = TextAnalysis.tokenEntropy(df, "doc_id", col("text"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((4L, 4L, 2.0)))
    assert(got(2L) == ((4L, 1L, 0.0)))
    val (n3, d3, h3) = got(3L)
    assert((n3, d3) == ((3L, 2L)))
    val expected = (math.log(3) - 2 * math.log(2) / 3) / math.log(2)
    assert(math.abs(h3 - BigDecimal(expected)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) == 0.0)
  }

  test("entropy fold is deterministic across repartitionings") {
    val rnd = new scala.util.Random(3)
    val texts = (0L until 40L).map(i =>
      i -> Seq.fill(30)(s"t${rnd.nextInt(9)}").mkString(" "))
    val a = TextAnalysis.tokenEntropy(
        docsDf(texts: _*).repartition(1), "doc_id", col("text"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = TextAnalysis.tokenEntropy(
        docsDf(texts: _*).repartition(13), "doc_id", col("text"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
