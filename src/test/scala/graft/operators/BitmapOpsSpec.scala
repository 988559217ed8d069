package graft.operators

import graft.SparkTestBase
import graft.plans.BitmapCode
import org.apache.spark.sql.functions._

/** Bitmap set-algebra kernels + the segment-overlap operator.
  * The operator is cross-checked against a brute-force
  * distinct-pairs join on data that exercises every structural edge:
  * duplicate memberships, ids straddling bucket boundaries, negative
  * ids, bucket-sparse segments, and zero-overlap pairs (omitted). */
class BitmapOpsSpec extends SparkTestBase {

  test("sparse blobs: sorted-shorts encoding, round-trip, O(1) count") {
    val buf = BitmapCode.emptyBuffer()
    BitmapCode.set(buf, 0)
    BitmapCode.set(buf, 9)
    BitmapCode.set(buf, 200)
    val bytes = BitmapCode.toBytes(buf)
    // 3 set bits << SparseMax → tag 1 + 3 little-endian u16s = 7 bytes
    // (the dense trimmed form would be 26 — the sparse win)
    assert(bytes.length === 7)
    assert(bytes(0) === 1.toByte)
    assert(BitmapCode.fromBytes(bytes).toSeq === buf.toSeq)
    assert(BitmapCode.count(bytes) === 3L)
    // empty bitmap is zero bytes in either representation
    assert(BitmapCode.toBytes(BitmapCode.emptyBuffer()).isEmpty)
  }

  test("representation switch at the roaring break-even (SparseMax)") {
    // exactly SparseMax set bits → still sparse; one more → dense
    val atMax = BitmapCode.emptyBuffer()
    (0 until BitmapCode.SparseMax).foreach(i => BitmapCode.set(atMax, i * 2))
    val sparse = BitmapCode.toBytes(atMax)
    assert(sparse(0) === 1.toByte)
    assert(sparse.length === 1 + 2 * BitmapCode.SparseMax)
    assert(BitmapCode.count(sparse) === BitmapCode.SparseMax.toLong)
    assert(BitmapCode.fromBytes(sparse).toSeq === atMax.toSeq)

    BitmapCode.set(atMax, BitmapCode.SparseMax * 2) // now SparseMax + 1 bits
    val dense = BitmapCode.toBytes(atMax)
    assert(dense(0) === 0.toByte)
    // dense payload = trimmed bytes up to the highest bit (2·SparseMax)
    assert(dense.length === 2 + (BitmapCode.SparseMax * 2) / 8)
    assert(BitmapCode.count(dense) === (BitmapCode.SparseMax + 1).toLong)
    assert(BitmapCode.fromBytes(dense).toSeq === atMax.toSeq)
  }

  test("andCount across all representation pairs") {
    // sparse × sparse (different lengths, one trims short of 65535)
    val a = BitmapCode.emptyBuffer()
    val b = BitmapCode.emptyBuffer()
    Seq(1, 70, 500, 65535).foreach(BitmapCode.set(a, _))
    Seq(1, 500).foreach(BitmapCode.set(b, _))
    val (ba, bb) = (BitmapCode.toBytes(a), BitmapCode.toBytes(b))
    assert(ba.length > bb.length)
    assert(BitmapCode.andCount(ba, bb) === 2L)
    assert(BitmapCode.andCount(bb, ba) === 2L)
    assert(BitmapCode.andCount(ba, Array.emptyByteArray) === 0L)

    // dense × sparse and dense × dense: dense holds all even offsets
    // below 2·SparseMax+2 (> SparseMax bits), sparse holds a few probes
    val d = BitmapCode.emptyBuffer()
    (0 to BitmapCode.SparseMax).foreach(i => BitmapCode.set(d, i * 2))
    val bd = BitmapCode.toBytes(d)
    assert(bd(0) === 0.toByte)
    // probes: 70, 500 (even, in range → hit); 1, 65535 (odd → miss)
    assert(BitmapCode.andCount(bd, ba) === 2L)
    assert(BitmapCode.andCount(ba, bd) === 2L)
    assert(BitmapCode.andCount(bd, bd) === (BitmapCode.SparseMax + 1).toLong)
  }

  test("set rejects offsets outside the bucket width") {
    val buf = BitmapCode.emptyBuffer()
    intercept[IllegalArgumentException](BitmapCode.set(buf, -1))
    intercept[IllegalArgumentException](BitmapCode.set(buf, 65536))
  }

  test("segmentOverlap matches brute-force distinct pairs") {
    import spark.implicits._
    // ids straddle the 65,536 bucket boundary, include negatives, and
    // repeat (duplicate memberships must not inflate counts)
    val rows = Seq(
      ("a", 1L), ("a", 1L), ("a", 5L), ("a", 70000L), ("a", -3L),
      ("b", 1L), ("b", 70000L), ("b", 131073L), ("b", -3L),
      ("c", 5L), ("c", 131073L),
      ("d", 999999L) // overlaps nothing → absent from output
    ).toDF("seg", "id")
    val got = BitmapOps.segmentOverlap(rows, $"seg", $"id")
      .orderBy("seg_a", "seg_b")
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq

    val d = rows.distinct()
    val brute = d.as("x").join(d.as("y"),
        $"x.id" === $"y.id" && $"x.seg" < $"y.seg")
      .groupBy($"x.seg".as("seg_a"), $"y.seg".as("seg_b"))
      .agg(count(lit(1)).as("n_common"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap

    assert(got.map(t => (t._1, t._2) -> t._3).toMap === brute)
    // sizes and exact-integer jaccard: a={1,5,70000,-3} b={1,70000,131073,-3}
    val ab = got.find(t => t._1 == "a" && t._2 == "b").get
    assert(ab === ("a", "b", 3L, 4L, 4L, 1000000L * 3 / 5))
    assert(!got.exists(t => t._1 == "d" || t._2 == "d"))
  }

  test("orBytes unions every representation pair exactly") {
    def blobOf(offs: Seq[Int]): Array[Byte] = {
      val b = BitmapCode.emptyBuffer()
      offs.foreach(BitmapCode.set(b, _))
      BitmapCode.toBytes(b)
    }
    val sparse = blobOf(Seq(1, 9, 200))
    val dense = blobOf(0 until 5000) // past SparseMax -> dense
    val empty = BitmapCode.toBytes(BitmapCode.emptyBuffer())
    def union(a: Array[Byte], b: Array[Byte]): Long = {
      val buf = BitmapCode.emptyBuffer()
      BitmapCode.orBytes(buf, a)
      BitmapCode.orBytes(buf, b)
      BitmapCode.count(BitmapCode.toBytes(buf))
    }
    assert(union(sparse, sparse) === 3L)
    assert(union(sparse, dense) === 5000L) // {1,9,200} ⊂ [0,5000)
    assert(union(dense, blobOf(Seq(6000, 65535))) === 5002L)
    assert(union(empty, sparse) === 3L && union(empty, empty) === 0L)
  }

  test("rollingDistinct matches brute-force windowed count(distinct), " +
      "including gaps, duplicates, bucket-straddling ids, and w=1") {
    import spark.implicits._
    // days 10,11,12, GAP, 15 — ids repeat within and across days and
    // straddle the 65,536 bucket boundary; nulls excluded by contract
    val rows = Seq[(java.lang.Long, java.lang.Long)](
      (10L, 1L), (10L, 1L), (10L, 70000L),
      (11L, 1L), (11L, 2L),
      (12L, 131073L), (12L, 70000L),
      (15L, 1L), (15L, null)
    ).toDF("p", "id")
    def brute(w: Int): Map[Long, Long] = {
      val d = rows.filter($"id".isNotNull).distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val ps = d.map(_._1).distinct
      ps.map(p => p ->
        d.filter(x => x._1 >= p - w + 1 && x._1 <= p).map(_._2)
          .distinct.length.toLong).toMap
    }
    for (w <- Seq(1, 3, 7)) {
      val got = BitmapOps.rollingDistinct(rows, $"p", $"id", w)
        .as[(Long, Long)].collect().toMap
      assert(got === brute(w), s"w=$w")
    }
    // the trailing-window semantics, spelled out: at w=3, day 12 sees
    // days 10..12 = {1, 70000, 2, 131073}; gap day 15 sees only itself
    val w3 = BitmapOps.rollingDistinct(rows, $"p", $"id", 3)
      .as[(Long, Long)].collect().toMap
    assert(w3(12L) === 4L && w3(15L) === 1L)
  }

  test("graft_bitmap_agg dedups map-side: duplicates don't change the blob") {
    import spark.implicits._
    val once = Seq(1, 5, 9).toDF("off")
    val thrice = Seq(1, 5, 9, 1, 5, 9, 1, 5, 9).toDF("off")
    def blob(df: org.apache.spark.sql.DataFrame): Seq[Byte] =
      df.agg(graft.plans.GraftExtensions
        .nativeFn("graft_bitmap_agg", col("off")))
        .head().getAs[Array[Byte]](0).toSeq
    assert(blob(once) === blob(thrice))
  }

  test("non-castable ids fail LOUDLY instead of silently vanishing " +
      "(ADVICE r13) — in non-ANSI sessions via the graft guard; NULL " +
      "ids still drop per the documented contract") {
    import spark.implicits._
    val bad = Seq(("s1", "17"), ("s1", "user-42"), ("s2", "3"))
      .toDF("seg", "id")
    // non-ANSI: cast('long') would NULL 'user-42' and the filter would
    // silently drop it — the guard must convert that into a job failure
    // naming the remedy
    val ansiWas = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val ex = intercept[Exception] {
        BitmapOps.segmentBitmaps(bad, $"seg", $"id").collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(ex).exists(m =>
        m.contains("user-42") && m.contains("dense_rank")), messages(ex))
      // numeric strings and NULLs keep the documented behavior: cast
      // fine / dropped fine
      val ok = Seq(("s1", Option("17")), ("s1", None), ("s2", Option("3")))
        .toDF("seg", "id")
      val n = BitmapOps.segmentBitmaps(ok, $"seg", $"id")
        .agg(sum(graft.plans.GraftExtensions
          .nativeFn("graft_bitmap_count", col("bm")))).head().getLong(0)
      assert(n === 2L)
    } finally spark.conf.set("spark.sql.ansi.enabled", ansiWas)
    // ANSI (the default): the cast itself is the loud failure
    if (ansiWas == "true") {
      intercept[Exception] {
        BitmapOps.segmentBitmaps(bad, $"seg", $"id").collect()
      }
    }
  }
}
