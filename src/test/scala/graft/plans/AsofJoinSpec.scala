package graft.plans

import graft.SparkTestBase
import graft.query.QueryOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import scala.util.Random

/** Semantics lock for the as-of operator (QueryOps.asofJoin, the
  * composed union+window form — the engine's ONLY as-of path since the
  * custom sort-merge exec was deleted on benchmark evidence; see
  * PERF.md §as-of). The reference implementation here is an
  * independent formulation: plain theta join on rt <= t, then
  * row_number pick of the greatest rt per left row. */
class AsofJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(epochSec: Long) = new Timestamp(epochSec * 1000)

  /** Brute-force as-of: join all preceding right rows, keep the latest
    * (rt desc) per left row; left rows with no match survive via the
    * left join. Deliberately a different query shape than the operator
    * under test. */
  private def bruteAsof(left: DataFrame, right: DataFrame,
                        key: String, lt: String, rt: String,
                        values: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.withColumn("__lid", monotonically_increasing_id())
    val joined = l.join(right.withColumnRenamed(key, "__rk"),
      col(key) <=> col("__rk") && col(rt) <= col(lt), "left")
    val w = Window.partitionBy("__lid").orderBy(desc_nulls_last(rt))
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rk", "__rn", "__lid", rt)
  }

  test("as-of == brute-force latest-preceding join on randomized inputs") {
    val rnd = new Random(3)
    val left = (1 to 500).map { i =>
      (i.toLong, s"k${rnd.nextInt(20)}", ts(rnd.nextInt(1000).toLong))
    }.toDF("id", "k", "t")
    // unique (key, rt): one right row per (key, slot)
    val right = (for {
      k <- 0 until 15; slot <- 0 until 30 if rnd.nextInt(3) == 0
    } yield (s"k$k", ts(slot * 37L), rnd.nextDouble(), s"v$k-$slot"))
      .toDF("k", "rt", "price", "label")

    val got = QueryOps.asofJoin(left, right, Seq("k"), "t", "rt",
      Seq("price", "label"))
    val want = bruteAsof(left, right, "k", "t", "rt",
      Seq("price", "label"))
    assert(got.columns.sorted.toSeq == want.columns.sorted.toSeq)
    val cols = got.columns.sorted.toSeq
    def rows(df: DataFrame) = df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    assert(rows(got) == rows(want))
  }

  test("as-of edge cases: equal ts inclusive, no-match key, nulls") {
    val left = Seq(
      (1L, "k1", ts(100)), (2L, "k1", ts(50)), (3L, "k1", ts(10)),
      (4L, "k2", ts(100)), (5L, "k3", ts(100))
    ).toDF("id", "k", "t")
    val right = Seq(
      ("k1", ts(50), Option(10.0)),   // equal-ts match for id=2
      ("k1", ts(80), None),           // NULL value must survive for id=1
      ("k2", ts(90), Option(40.0))
    ).toDF("k", "rt", "v")
    val got = QueryOps.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(1L -> None, 2L -> Some(10.0), 3L -> None,
      4L -> Some(40.0), 5L -> None))
  }

  test("as-of plans one shuffle on the keys (union + window, no join)") {
    val left = Seq((1L, "k", ts(5))).toDF("id", "k", "t")
    val right = Seq(("k", ts(1), 1.0)).toDF("k", "rt", "v")
    val df = QueryOps.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("NULL keys and NULL times order smallest (documented divergence)") {
    // Documented divergence from DuckDB native ASOF (which never
    // matches NULL keys/times): NULLs sort first, so NULL-key left
    // rows match NULL-key right rows, and a NULL rightTime precedes
    // every left time within its key group (Window.partitionBy groups
    // NULLs; the running last orders them first).
    val left = Seq(
      (1L, Option("k1"), Option(ts(100))),
      (2L, None: Option[String], Option(ts(100))), // NULL key
      (3L, Option("k1"), None: Option[Timestamp])  // NULL left time
    ).toDF("id", "k", "t")
    val right = Seq(
      (Option("k1"), Option(ts(50)), 1.0),
      (None: Option[String], Option(ts(10)), 2.0),          // NULL key
      (Option("k1"), None: Option[Timestamp], 3.0)          // NULL right time
    ).toDF("k", "rt", "v")
    // id=1: rt=50 is the latest <= 100 (NULL rt sorts before it)
    // id=2: NULL key group, rt=10 <= 100
    // id=3: NULL left time — only the NULL-rt row "precedes" it
    val got = QueryOps.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(3.0)))
  }

  test("as-of handles an empty right side") {
    val left = Seq((1L, "k", ts(5))).toDF("id", "k", "t")
    val right = Seq.empty[(String, Timestamp, Double)]
      .toDF("k", "rt", "v")
    val got = QueryOps.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("id", "v").collect()
    assert(got.length == 1 && got(0).isNullAt(1))
  }

  test("as-of with multi-column keys") {
    val left = Seq((1L, "a", 1, ts(10)), (2L, "a", 2, ts(10)))
      .toDF("id", "k1", "k2", "t")
    val right = Seq(("a", 1, ts(5), 1.5), ("a", 2, ts(20), 9.9))
      .toDF("k1", "k2", "rt", "v")
    val got = QueryOps.asofJoin(left, right, Seq("k1", "k2"), "t", "rt",
        Seq("v"))
      .select("id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(1L -> Some(1.5), 2L -> None))
  }
}
