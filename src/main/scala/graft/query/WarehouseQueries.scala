package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, FuzzyJoin, Skyline, ZOrder}
import graft.plans.ZOrderOps
import graft.sources.Tables

/** Warehouse-analytics operators beyond the reference surface:
  * Pareto frontiers (distributed skyline), edit-distance similarity
  * joins (deletion-neighborhood blocking), Z-order clustering keys
  * (multi-dimensional data skipping), SCD-2 history reconstruction
  * (gaps-and-islands), entity resolution, and order-statistic
  * transforms. Graph analytics live in [[GraphQueries]]. Each query
  * carries a full rows+schema+hash DuckDB oracle. */
object WarehouseQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- distributed skyline (Pareto frontier) ----

  /** Customers on the (total spend, order count) Pareto frontier —
    * the "best under any monotone preference" set. The operator is
    * the two-phase distributed skyline ([[Skyline]]): per-partition
    * sort-sweep pruning (no shuffle), then one tiny merge pass; the
    * oracle is the O(n²) relational NOT EXISTS definition, so the
    * gate certifies the distributed algorithm against the textbook
    * semantics including ties and duplicates. */
  def skylineCustomers(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("spend"),
        count(lit(1)).as("n_orders"))
    Skyline.skylineMax(per, "spend", "n_orders")
      .orderBy("custkey")
  }

  val skylineCustomersSql: String =
    """WITH s AS (SELECT o_custkey AS custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
      |    COUNT(*) AS n_orders
      |  FROM orders GROUP BY 1)
      |SELECT custkey, spend, n_orders FROM s p
      |WHERE NOT EXISTS (SELECT 1 FROM s q
      |  WHERE q.spend >= p.spend AND q.n_orders >= p.n_orders
      |    AND (q.spend > p.spend OR q.n_orders > p.n_orders))
      |ORDER BY custkey""".stripMargin

  /** Three-dimensional frontier — (total spend, order count, most
    * recent order) all maximized: the "recent, frequent, big" nobody-
    * beats-them set. Past two dimensions the sort-sweep no longer
    * applies, so this runs the block-nested-loop local phase
    * ([[Skyline.skylineMaxN]]); the oracle is the same NOT EXISTS
    * definition with three conjuncts. */
  def skyline3Customers(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("spend"),
        count(lit(1)).as("n_orders"),
        max(unix_micros(col("o_orderdate")
          .cast(org.apache.spark.sql.types.TimestampType))).as("last_us"))
    Skyline.skylineMaxN(per, Seq("spend", "n_orders", "last_us"))
      .orderBy("custkey")
  }

  val skyline3CustomersSql: String =
    """WITH s AS (SELECT o_custkey AS custkey,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
      |    COUNT(*) AS n_orders,
      |    CAST(MAX(epoch_us(o_orderdate)) AS BIGINT) AS last_us
      |  FROM orders GROUP BY 1)
      |SELECT custkey, spend, n_orders, last_us FROM s p
      |WHERE NOT EXISTS (SELECT 1 FROM s q
      |  WHERE q.spend >= p.spend AND q.n_orders >= p.n_orders
      |    AND q.last_us >= p.last_us
      |    AND (q.spend > p.spend OR q.n_orders > p.n_orders
      |         OR q.last_us > p.last_us))
      |ORDER BY custkey""".stripMargin

  // ---- fuzzy (edit-distance) join ----

  /** Every customer name within edit distance 1 of a corrupted probe
    * set (each 7th name with its last character replaced). The
    * engine side is the linear-cost FastSS blocking join
    * ([[FuzzyJoin.lev1Join]]); the oracle is the quadratic
    * cross-join + levenshtein definition — the gate certifies the
    * blocking loses no pair. Probes can match several customers
    * (names differing only in the replaced character), which is the
    * interesting part of the fixture. */
  def fuzzyJoinNames(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val probes = cust.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("probe_key"),
        concat(expr("substring(c_name, 1, length(c_name) - 1)"), lit("X"))
          .as("probe_name"))
    val cands = cust.select(col("c_custkey").as("cand_key"), col("c_name"))
    FuzzyJoin.lev1Join(probes, "probe_key", "probe_name",
        cands, "cand_key", "c_name")
      .select(col("probe_key"), col("cand_key"),
        col("dist").cast("long").as("dist"))
      .orderBy("probe_key", "cand_key")
  }

  val fuzzyJoinNamesSql: String =
    """WITH probes AS (SELECT c_custkey AS probe_key,
      |    substr(c_name, 1, length(c_name) - 1) || 'X' AS probe_name
      |  FROM customer WHERE c_custkey % 7 = 0)
      |SELECT p.probe_key, c.c_custkey AS cand_key,
      |  CAST(levenshtein(p.probe_name, c.c_name) AS BIGINT) AS dist
      |FROM probes p CROSS JOIN customer c
      |WHERE levenshtein(p.probe_name, c.c_name) <= 1
      |ORDER BY probe_key, cand_key""".stripMargin

  /** The probe fixture at radius 2 ([[FuzzyJoin.levJoin]] k=2,
    * depth-2 deletion neighborhoods): each probe now also matches
    * customers whose names differ in the replaced character AND one
    * more digit — the match set the oracle's quadratic
    * `levenshtein <= 2` definition pins exactly. Probes are sparser
    * than the radius-1 query (every 97th name): on digit-dense keys
    * the depth-2 neighborhoods of near-identical strings share large
    * buckets, so candidate volume scales with probe count times
    * bucket density — the documented cost of the wider radius (PERF
    * round-8 notes), not a plan defect. */
  def fuzzyJoin2Names(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val probes = cust.filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey").as("probe_key"),
        concat(expr("substring(c_name, 1, length(c_name) - 1)"), lit("X"))
          .as("probe_name"))
    val cands = cust.select(col("c_custkey").as("cand_key"), col("c_name"))
    FuzzyJoin.levJoin(probes, "probe_key", "probe_name",
        cands, "cand_key", "c_name", k = 2)
      .select(col("probe_key"), col("cand_key"),
        col("dist").cast("long").as("dist"))
      .orderBy("probe_key", "cand_key")
  }

  val fuzzyJoin2NamesSql: String =
    """WITH probes AS (SELECT c_custkey AS probe_key,
      |    substr(c_name, 1, length(c_name) - 1) || 'X' AS probe_name
      |  FROM customer WHERE c_custkey % 97 = 0)
      |SELECT p.probe_key, c.c_custkey AS cand_key,
      |  CAST(levenshtein(p.probe_name, c.c_name) AS BIGINT) AS dist
      |FROM probes p CROSS JOIN customer c
      |WHERE levenshtein(p.probe_name, c.c_name) <= 2
      |ORDER BY probe_key, cand_key""".stripMargin

  /** The `maxBucket` skew cap under the hash gate (VERDICT r8 item 7):
    * drop-oversized blocking-bucket semantics, exercised on a
    * SF-invariant hot-key fixture (custkey < 120 exists at every SF).
    * Candidates: custkey%3==0 rows all named `HOT` (a 40-row hot
    * bucket — the blocking-skew pathology), the rest unique
    * `u<key>`. Probes (custkey%4==1) append `X`. With maxBucket=10:
    * every `HOT` deletion bucket (40 rows) is dropped on the RIGHT
    * side, so hot matches vanish; the 10-row `HOTX` probe buckets sit
    * exactly AT the cap on the LEFT side (certifying <=, not <); the
    * unique-name buckets (size 1) pass, so each non-hot probe still
    * finds its base candidate at dist 1. The oracle replays the SAME
    * per-(key, side) count filter in SQL over the FastSS deletion
    * neighborhoods — string keys there, xxhash64 keys here (a
    * collision would only merge counts; none occurs on this data, and
    * the hash gate would catch it). */
  def fuzzyJoinCapped(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_custkey") < 120)
    def skewName(key: Column): Column =
      when(key % 3 === 0, lit("HOT"))
        .otherwise(concat(lit("u"), key.cast("string")))
    val cands = cust.select(col("c_custkey").as("cand_key"),
      skewName(col("c_custkey")).as("cand_name"))
    val probes = cust.filter(col("c_custkey") % 4 === 1)
      .select(col("c_custkey").as("probe_key"),
        concat(skewName(col("c_custkey")), lit("X")).as("probe_name"))
    FuzzyJoin.levJoin(probes, "probe_key", "probe_name",
        cands, "cand_key", "cand_name", k = 1, maxBucket = 10)
      .select(col("probe_key"), col("cand_key"),
        col("dist").cast("long").as("dist"))
      .orderBy("probe_key", "cand_key")
  }

  // FastSS deletion neighborhood in SQL: the string plus every
  // single-character deletion, distinct — then the cap is a per-(key,
  // side) window count filter, exactly keyed's drop-oversized rule.
  val fuzzyJoinCappedSql: String =
    """WITH base AS (SELECT c_custkey AS key,
      |    CASE WHEN c_custkey % 3 = 0 THEN 'HOT'
      |         ELSE 'u' || c_custkey END AS nm
      |  FROM customer WHERE c_custkey < 120),
      |probes AS (SELECT key AS probe_key, nm || 'X' AS probe_name
      |  FROM base WHERE key % 4 = 1),
      |cands AS (SELECT key AS cand_key, nm AS cand_name FROM base),
      |lk AS (SELECT probe_key, probe_name, unnest(list_distinct(
      |    [probe_name] || [substr(probe_name, 1, i - 1) ||
      |       substr(probe_name, i + 1)
      |     FOR i IN range(1, length(probe_name) + 1)])) AS k
      |  FROM probes),
      |rk AS (SELECT cand_key, cand_name, unnest(list_distinct(
      |    [cand_name] || [substr(cand_name, 1, i - 1) ||
      |       substr(cand_name, i + 1)
      |     FOR i IN range(1, length(cand_name) + 1)])) AS k
      |  FROM cands),
      |lkc AS (SELECT * FROM lk
      |  QUALIFY count(*) OVER (PARTITION BY k) <= 10),
      |rkc AS (SELECT * FROM rk
      |  QUALIFY count(*) OVER (PARTITION BY k) <= 10),
      |pairs AS (SELECT DISTINCT probe_key, probe_name, cand_key, cand_name
      |  FROM lkc JOIN rkc USING (k))
      |SELECT probe_key, cand_key,
      |  CAST(levenshtein(probe_name, cand_name) AS BIGINT) AS dist
      |FROM pairs WHERE levenshtein(probe_name, cand_name) <= 1
      |ORDER BY probe_key, cand_key""".stripMargin

  // ---- Z-order clustering key ----

  /** The Morton key over (user_id, event_id) for every event — the
    * clustering column a z-ordered write sorts on ([[ZOrder]]). The
    * oracle recomputes the 42-bit interleave as the explicit
    * bit-by-bit sum, certifying the codegen'd spread-mask native
    * expression bit for bit; the layout effect (file-level skipping
    * on both dimensions) is locked by ZOrderSpec. */
  def zorderKeys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        ZOrder.zkey(col("user_id"), col("event_id")).as("z"))
      .orderBy("z", "event_id")

  val zorderKeysSql: String = {
    val terms = (0 until ZOrderOps.Bits).flatMap { i =>
      Seq(s"(((user_id >> $i) & 1) << ${2 * i})",
        s"(((event_id >> $i) & 1) << ${2 * i + 1})")
    }
    s"""SELECT event_id, user_id,
       |  (${terms.mkString(" | ")}) AS z
       |FROM events ORDER BY z, event_id""".stripMargin
  }

  /** 3-D Morton key over (user_id, event_id, floor(value·100)) —
    * the tenant × time × key layout shape. `floor` before the long
    * cast on BOTH sides (Spark casts truncate toward zero, DuckDB
    * rounds half-even — floor removes the divergence); the oracle
    * rebuilds the 63-bit interleave bit by bit. */
  def zorder3Keys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        floor(col("value") * 100).cast("long").as("v100"))
      .select(col("event_id"), col("user_id"), col("v100"),
        ZOrder.zkey3(col("user_id"), col("event_id"), col("v100"))
          .as("z"))
      .orderBy("z", "event_id")

  val zorder3KeysSql: String = {
    val dims = Seq("user_id" -> 0, "event_id" -> 1, "v100" -> 2)
    val terms = (0 until ZOrderOps.Bits).flatMap { i =>
      dims.map { case (c, off) => s"((($c >> $i) & 1) << ${3 * i + off})" }
    }
    s"""WITH e AS (SELECT event_id, user_id,
       |    CAST(floor(value * 100) AS BIGINT) AS v100 FROM events)
       |SELECT event_id, user_id, v100,
       |  (${terms.mkString(" | ")}) AS z
       |FROM e ORDER BY z, event_id""".stripMargin
  }

  // ---- SCD-2 history reconstruction (gaps and islands) ----

  /** Collapse each user's event stream into versioned
    * validity intervals over `event_type` — the slowly-changing-
    * dimension type-2 shape (the reference's firstSeen/lastSeen
    * upsert generalized to full history): one island per run of
    * consecutive equal values, `valid_from` = first observation,
    * `valid_to` = next island's start (NULL while current). Two
    * windows and one aggregation, all partitioned on `user_id` —
    * one shuffle at any scale. */
  def scd2History(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.loadEventsTs(s, dir).select(col("user_id"),
      col("us"), col("event_id"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val prev = lag("event_type", 1).over(w)
    val chg = when(prev.isNull || prev =!= col("event_type"), 1L)
      .otherwise(0L)
    ev.withColumn("version", sum(chg).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "version")
      .agg(min("event_type").as("event_type"), // constant within island
        min("us").as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead("valid_from", 1)
        .over(Window.partitionBy("user_id").orderBy("version")))
      .select("user_id", "version", "event_type", "valid_from",
        "valid_to", "n_events")
      .orderBy("user_id", "version")
  }

  val scd2HistorySql: String =
    """WITH o AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
      |  FROM events),
      |c AS (SELECT user_id, event_id, event_type, us,
      |    CASE WHEN lag(event_type) OVER w IS NULL
      |           OR lag(event_type) OVER w <> event_type
      |         THEN 1 ELSE 0 END AS chg
      |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |i AS (SELECT user_id, event_type, us,
      |    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS version
      |  FROM c),
      |g AS (SELECT user_id, version, min(event_type) AS event_type,
      |    min(us) AS valid_from, count(*) AS n_events
      |  FROM i GROUP BY 1, 2)
      |SELECT user_id, version, event_type, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |    AS valid_to,
      |  n_events
      |FROM g ORDER BY user_id, version""".stripMargin

  // ---- batch CDC apply (change-data-capture reconciliation) ----

  /** Reconstruct current state from a change stream with deletes —
    * the batch MERGE/CDC-apply primitive: per key take the LAST
    * operation by `(ts, event_id)`; a trailing delete removes the
    * key, otherwise the last upsert's payload wins. Derived op
    * mapping on `events` (`signup`→insert, `error`→delete, rest→
    * update) gives every key a nontrivial op history. One
    * row_number window per key partition — the same single-shuffle
    * shape at any scale; at 100 TB the change stream is the small
    * side and this plan never rescans the base (the reconstructed
    * state IS the output, the reference's last-write-wins upsert
    * [T4] generalized with deletes). */
  def cdcApply(s: SparkSession, dir: String): DataFrame = {
    val ops = Tables.loadEventsTs(s, dir).select(
      col("user_id"),
      col("us"),
      col("event_id"),
      when(col("event_type") === "signup", lit("I"))
        .when(col("event_type") === "error", lit("D"))
        .otherwise(lit("U")).as("op"),
      col("value"))
    val w = Window.partitionBy("user_id")
      .orderBy(desc("us"), desc("event_id"))
    ops.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("user_id"), col("op").as("last_op"),
        col("us").as("last_us"), col("value").as("last_value"))
      .orderBy("user_id")
  }

  val cdcApplySql: String =
    """WITH ops AS (SELECT user_id, epoch_us(ts) AS us, event_id,
      |    CASE event_type WHEN 'signup' THEN 'I'
      |                    WHEN 'error' THEN 'D' ELSE 'U' END AS op,
      |    value
      |  FROM events),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY us DESC, event_id DESC) AS rn FROM ops)
      |SELECT user_id, op AS last_op, us AS last_us, value AS last_value
      |FROM r WHERE rn = 1 AND op <> 'D'
      |ORDER BY user_id""".stripMargin

  /** Integer-scaled EWMA decayed counters
    * ([[QueryOps.ewmaScan]], alpha = 0.30, scale 10^6) per user over
    * the event stream — the sequential recurrence NO window function
    * expresses (integer division each step makes it non-associative),
    * evaluated as a per-key sorted scan. The oracle replays the
    * identical integer sequence with a recursive CTE over
    * row_number — truncating and flooring division agree because the
    * metric is non-negative. */
  def ewmaDecay(s: SparkSession, dir: String): DataFrame =
    QueryOps.ewmaScan(
        Tables.loadEventsTs(s, dir).filter(col("user_id") < 50),
        col("user_id"), col("us"), col("event_id"),
        col("event_id") % 100, alphaNum = 30, alphaDen = 100)
      .select(col("key").as("user_id"), col("us"),
        col("tie").as("event_id"), col("v"), col("ewma"))
      .orderBy("user_id", "us", "event_id")

  val ewmaDecaySql: String =
    """WITH RECURSIVE ev AS (SELECT user_id, epoch_us(ts) AS us, event_id,
      |    event_id % 100 AS v,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events WHERE user_id < 50),
      |scan AS (SELECT user_id, us, event_id, v, rn,
      |    CAST(v * 1000000 AS BIGINT) AS ewma
      |  FROM ev WHERE rn = 1
      |  UNION ALL
      |  SELECT e.user_id, e.us, e.event_id, e.v, e.rn,
      |    CAST((30 * e.v * 1000000 + 70 * s.ewma) // 100 AS BIGINT)
      |  FROM scan s JOIN ev e ON e.user_id = s.user_id
      |    AND e.rn = s.rn + 1)
      |SELECT user_id, us, CAST(event_id AS BIGINT) AS event_id,
      |  CAST(v AS BIGINT) AS v, ewma
      |FROM scan ORDER BY user_id, us, event_id""".stripMargin

  /** Robust outliers by median absolute deviation per event type:
    * |value − median| > 3·MAD — the data-quality screen that survives
    * the outliers it hunts (unlike z-scores, whose mean/stddev the
    * outliers drag). Two per-group EXACT percentiles (engine-shared
    * interpolation definition — see [[CoreQueries.groupQuantiles]];
    * approx_percentile is the corpus-scale variant and stays out of
    * the hash gate) + one broadcast of the group-count-sized stats. */
  def madOutliers(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("absdev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(absdev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("absdev") > lit(3.0) * col("mad"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"))
      .orderBy("event_id")
  }

  val madOutliersSql: String =
    """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
      |  FROM events GROUP BY 1),
      |d AS (SELECT e.event_id, e.event_type, e.value, m.med,
      |    abs(e.value - m.med) AS ad
      |  FROM events e JOIN m USING (event_type)),
      |md AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
      |  FROM d GROUP BY 1)
      |SELECT d.event_id, d.event_type, d.value, d.med, md.mad
      |FROM d JOIN md USING (event_type)
      |WHERE d.ad > 3 * md.mad
      |ORDER BY event_id""".stripMargin

  /** Per-group winsorization at EXACT discrete p05/p95 — the robust
    * alternative to dropping outliers: clip, don't delete. The
    * percentile positions are pure integer arithmetic
    * (`ceil(n/20) = (n+19) div 20`, `ceil(19n/20) = (19n+19) div 20`
    * as rationals 1/20 and 19/20), so the chosen bounds are EXISTING
    * data values — no interpolation, no float in the gate; sums are
    * decimal-exact. Bounds come from the distributed two-pass
    * selection ([[graft.operators.OrderStats.discQuantiles]]) — NOT a
    * `Window.partitionBy(l_returnflag)`, which would funnel each of
    * the three giant groups through one task; the oracle states the
    * same k-th-element semantics in window form, which DuckDB can
    * afford at oracle scale. */
  def winsorize(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem").select(col("l_returnflag"),
      col("l_extendedprice").cast("decimal(18,2)").as("price"))
    val bounds = graft.operators.OrderStats
      .discQuantiles(base, "l_returnflag", "price",
        Seq((1L, 20L), (19L, 20L)))
      .groupBy(col("group").as("l_returnflag"))
      .agg(
        // doubles are exact for DECIMAL(18,2) at these magnitudes;
        // cast back so the clip stays decimal
        max(when(col("num") === 1, col("value")))
          .cast("decimal(18,2)").as("lo"),
        max(when(col("num") === 19, col("value")))
          .cast("decimal(18,2)").as("hi"))
    base.join(broadcast(bounds), "l_returnflag")
      .select(col("l_returnflag"), col("lo"), col("hi"),
        least(greatest(col("price"), col("lo")), col("hi")).as("clip"),
        (col("price") < col("lo")).cast("long").as("is_lo"),
        (col("price") > col("hi")).cast("long").as("is_hi"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        // decimal-exact internally; DOUBLE on the wire (exact at these
        // magnitudes, and both engines land on the same float64 — the
        // skyline precedent)
        max(col("lo")).cast("double").as("lo"),
        max(col("hi")).cast("double").as("hi"),
        sum(col("clip")).cast("double").as("sum_clipped"),
        sum(col("is_lo")).as("n_clipped_lo"),
        sum(col("is_hi")).as("n_clipped_hi"))
      .orderBy("l_returnflag")
  }

  val winsorizeSql: String =
    """WITH base AS (SELECT l_returnflag,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price FROM lineitem),
      |ranked AS (SELECT l_returnflag, price,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY price)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM base),
      |bounds AS (SELECT l_returnflag,
      |    MAX(CASE WHEN rn = (n + 19) // 20 THEN price END) AS lo,
      |    MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN price END) AS hi
      |  FROM ranked GROUP BY 1)
      |SELECT b.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MAX(o.lo) AS DOUBLE) AS lo, CAST(MAX(o.hi) AS DOUBLE) AS hi,
      |  -- CASE, not least/greatest: DuckDB's least() promotes
      |  -- DECIMAL operands to DOUBLE, which would float the sum
      |  CAST(SUM(CASE WHEN b.price < o.lo THEN o.lo
      |           WHEN b.price > o.hi THEN o.hi
      |           ELSE b.price END) AS DOUBLE) AS sum_clipped,
      |  CAST(SUM(CASE WHEN b.price < o.lo THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped_lo,
      |  CAST(SUM(CASE WHEN b.price > o.hi THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_clipped_hi
      |FROM base b JOIN bounds o USING (l_returnflag)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** First-order Markov transition matrix over per-user event
    * sequences — the "what follows what" behavioural model (funnel
    * generalization; also the bigram LM shape on event streams).
    * Counts are exact; probabilities are exact-integer ratios emitted
    * at 6 dp. One lead-window pass per user (hash-partitioned on
    * user_id — millions of small groups, the shape where windows DO
    * scale) + one count aggregate. */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val pairs = Tables.loadEventsTs(s, dir)
      .select(col("user_id"), col("us"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead("from_type", 1).over(w))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("row_total",
        sum("n").over(Window.partitionBy("from_type")))
      .withColumn("p",
        round(col("n").cast("double") / col("row_total"), 6))
      .orderBy("from_type", "to_type")
  }

  val eventTransitionsSql: String =
    """WITH p AS (SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS to_type
      |  FROM events),
      |c AS (SELECT from_type, to_type, COUNT(*) AS n FROM p
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total,
      |  round(CAST(n AS DOUBLE)
      |    / SUM(n) OVER (PARTITION BY from_type), 6) AS p
      |FROM c ORDER BY from_type, to_type""".stripMargin

  /** Entity resolution end-to-end: deletion-neighborhood blocking →
    * exact edit-distance verify ([[FuzzyJoin.levJoin]] as a self-join)
    * → connected components ([[Dedup.nearDupClusters]]) → canonical
    * entity id (min member). The record-linkage pipeline composed
    * from the engine's own parts — blocking keys bound the candidate
    * set, the pointer-jumping components run on verified pairs only.
    * The oracle is definitional: quadratic levenshtein ≤ 1 pairs,
    * recursive-CTE transitive closure. */
  def entityResolution(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_custkey") % 5 === 0)
    val left = c.select(col("c_custkey").as("id_a"),
      col("c_name").as("name_a"))
    val right = c.select(col("c_custkey").as("id_b"),
      col("c_name").as("name_b"))
    val pairs = FuzzyJoin.levJoin(left, "id_a", "name_a",
        right, "id_b", "name_b", k = 1)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    Dedup.nearDupClusters(pairs).orderBy("id")
  }

  val entityResolutionSql: String =
    """WITH RECURSIVE c AS (SELECT c_custkey AS id, c_name AS name
      |  FROM customer WHERE c_custkey % 5 = 0),
      |e AS (SELECT a.id AS a, b.id AS b FROM c a JOIN c b
      |  ON a.id < b.id AND levenshtein(a.name, b.name) <= 1),
      |und AS (SELECT a AS s, b AS t FROM e UNION SELECT b, a FROM e),
      |reach AS (SELECT s, t FROM und
      |  UNION SELECT r.s, u.t FROM reach r JOIN und u ON r.t = u.s),
      |n AS (SELECT DISTINCT s AS node FROM und)
      |SELECT n.node AS id, least(n.node, MIN(r.t)) AS cluster
      |FROM n JOIN reach r ON r.s = n.node
      |GROUP BY n.node ORDER BY id""".stripMargin

  /** Global rank transform ([[graft.operators.GlobalRank]]): every
    * lineitem ranked by price with a (orderkey, linenumber) tiebreak —
    * the scalable zipWithIndex shape (range repartition + driver-side
    * partition-offset prefix sum), NOT `row_number() OVER (ORDER BY
    * …)`, which moves the table to one task. The oracle IS that
    * window form, which DuckDB can afford at oracle scale; a 1-in-997
    * key sample bounds the emitted rows without weakening what the
    * ranking certifies (any wrong global offset shifts every rank
    * after it). */
  def rankTransform(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"),
      col("l_linenumber").cast("long").as("l_linenumber"),
      col("l_extendedprice").cast("decimal(18,2)").as("price"))
    graft.operators.GlobalRank.withRowNumber(li,
        Seq(col("price"), col("l_orderkey"), col("l_linenumber")),
        "rank")
      .filter((col("l_orderkey") * 31 + col("l_linenumber")) % 997 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("price").cast("double").as("price"), col("rank"))
      .orderBy("rank")
  }

  val rankTransformSql: String =
    """WITH r AS (SELECT l_orderkey,
      |    CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
      |    CAST(ROW_NUMBER() OVER (
      |      ORDER BY CAST(l_extendedprice AS DECIMAL(18,2)),
      |        l_orderkey, l_linenumber) AS BIGINT) AS rank
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber, CAST(price AS DOUBLE) AS price,
      |  rank
      |FROM r WHERE (l_orderkey * 31 + l_linenumber) % 997 = 0
      |ORDER BY rank""".stripMargin

  /** Equi-depth (equal-frequency) histogram of lineitem prices —
    * the zone-map/statistics primitive, reusing the OrderStats
    * two-pass selection for the eight exact k/8 boundaries (each an
    * EXISTING value at position ceil(k·n/8)) and assigning buckets
    * with a scan-level 8-way CASE built from the collected boundary
    * row (bounded scalar, 8 values): `bucket = min k with v ≤ b_k`.
    * One selection pass + one map-side-combined count — no window
    * over the fact table. */
  def histogramEquidepth(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "lineitem").select(lit("all").as("g"),
      col("l_extendedprice").cast("decimal(18,2)").as("price"))
    val bounds = graft.operators.OrderStats
      .discQuantiles(base, "g", "price", (1L to 8L).map(k => (k, 8L)))
      .select(col("num").cast("int").as("k"), col("value"))
      .collect().sortBy(_.getInt(0))
    val bucket = bounds.init.foldRight(lit(bounds.last.getInt(0))) {
      case (r, acc) =>
        when(col("price") <= lit(r.getDouble(1))
          .cast("decimal(18,2)"), r.getInt(0)).otherwise(acc)
    }
    base.select(bucket.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .join(s.createDataFrame(bounds.map(r =>
          (r.getInt(0), r.getDouble(1))).toSeq).toDF("bucket", "hi"),
        "bucket")
      .select(col("bucket").cast("long").as("bucket"), col("hi"),
        col("n"))
      .orderBy("bucket")
  }

  val histogramEquidepthSql: String =
    """WITH r AS (SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
      |    ROW_NUMBER() OVER (ORDER BY CAST(l_extendedprice
      |      AS DECIMAL(18,2))) AS rn,
      |    COUNT(*) OVER () AS n
      |  FROM lineitem),
      |b AS (SELECT k, MAX(price) AS hi FROM (
      |    SELECT rn, price, u.k FROM r,
      |      (SELECT r2.range + 1 AS k FROM range(8) r2) u
      |    WHERE rn = (u.k * n + 7) // 8)
      |  GROUP BY 1),
      |a AS (SELECT price,
      |    (SELECT MIN(k) FROM b WHERE price <= b.hi) AS bucket
      |  FROM r)
      |SELECT CAST(a.bucket AS BIGINT) AS bucket,
      |  CAST(b.hi AS DOUBLE) AS hi, CAST(COUNT(*) AS BIGINT) AS n
      |FROM a JOIN b ON b.k = a.bucket
      |GROUP BY 1, 2 ORDER BY bucket""".stripMargin

  /** Data-quality expectation report — the referential/nullability/
    * range/uniqueness screens a warehouse runs before publishing a
    * table, as one unioned count frame. Each check is a bounded
    * aggregate (anti-joins for orphans, a dup-surplus sum for key
    * uniqueness); the synthetic lineitem's duplicate (l_orderkey,
    * l_linenumber) pairs (TESTDATA.md) make the uniqueness row
    * legitimately non-zero. */
  def dqChecks(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    def one(name: String, n: DataFrame): DataFrame =
      n.select(lit(name).as("check_name"), col("n"))
    one("lineitem_dup_lineid",
        li.groupBy("l_orderkey", "l_linenumber")
          .agg(count(lit(1)).as("c")).filter(col("c") > 1)
          .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n")))
      .unionAll(one("lineitem_nonpositive_qty",
        li.filter(col("l_quantity") <= 0).agg(count(lit(1)).as("n"))))
      .unionAll(one("lineitem_orphans",
        li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n"))))
      .unionAll(one("orders_null_date",
        o.filter(col("o_orderdate").isNull).agg(count(lit(1)).as("n"))))
      .unionAll(one("orders_orphans",
        o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("n"))))
      .orderBy("check_name")
  }

  val dqChecksSql: String =
    """SELECT * FROM (
      |SELECT 'lineitem_dup_lineid' AS check_name,
      |  CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS n FROM (
      |    SELECT COUNT(*) AS c FROM lineitem
      |    GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
      |UNION ALL
      |SELECT 'lineitem_nonpositive_qty',
      |  CAST(COUNT(*) AS BIGINT) FROM lineitem WHERE l_quantity <= 0
      |UNION ALL
      |SELECT 'lineitem_orphans', CAST(COUNT(*) AS BIGINT)
      |FROM lineitem l WHERE NOT EXISTS (
      |  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |UNION ALL
      |SELECT 'orders_null_date', CAST(COUNT(*) AS BIGINT)
      |FROM orders WHERE o_orderdate IS NULL
      |UNION ALL
      |SELECT 'orders_orphans', CAST(COUNT(*) AS BIGINT)
      |FROM orders o WHERE NOT EXISTS (
      |  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |) ORDER BY check_name""".stripMargin

  /** Entity resolution under SORTED-NEIGHBORHOOD blocking
    * ([[graft.operators.SortedNeighborhood.pairs]], w = 5) — the
    * other classic candidate generator, deliberately gated on its OWN
    * semantics: the oracle ranks with the same (name, id) order and
    * bands by the same width, so the row set certifies exactly what
    * the O(n·w) blocking finds (including what it legitimately
    * misses vs q_entity_resolution's complete deletion-key blocking —
    * same fixture, different clusters, both pinned). */
  def entityResolutionSnb(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_custkey") % 5 === 0)
      .select(col("c_custkey").as("cid"), col("c_name"))
    val pairs = graft.operators.SortedNeighborhood
      .pairs(c, "cid", "c_name", w = 5)
      .filter(levenshtein(col("key_a"), col("key_b")) <= 1)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
    Dedup.nearDupClusters(pairs).orderBy("id")
  }

  /** Interval–interval overlap self-join
    * ([[graft.operators.IntervalJoin]]): order validity windows
    * `[orderdate, orderdate + orderkey%20 + 1]` in epoch days, pairs
    * that intersect with their exact overlap length — the bucketed
    * credit-rule join (each pair found in exactly ONE bucket, no
    * distinct exchange). The bucket width is DERIVED through
    * [[graft.operators.IntervalPlan.bucketWidthFor]] (p90 of the
    * observed lengths ≈ 19 here — lengths are o_orderkey%20 + 2), the
    * round-12 planner promotion: the credit rule makes the pair set
    * width-invariant, so the sizing aggregate can only shape cost.
    * The %67 slice keeps the oracle's quadratic form tractable while
    * the operator itself never goes all-pairs (1 / 221 / 22941 pairs
    * at sf0.001/0.01/0.1). */
  def intervalJoinOrders(s: SparkSession, dir: String): DataFrame = {
    val iv = t(s, dir, "orders")
      .filter(col("o_orderkey") % 67 === 0)
      .select(col("o_orderkey").as("oid"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("s"),
        (datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long") + col("o_orderkey") % 20 + 1L).as("e"))
    graft.operators.IntervalJoin
      .selfOverlapPairsAuto(iv, "oid", "s", "e")
      .select(col("id_a"), col("id_b"), col("overlap").as("overlap_days"))
      .orderBy("id_a", "id_b")
  }

  val intervalJoinOrdersSql: String =
    """WITH iv AS (SELECT o_orderkey AS oid,
      |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      AS s,
      |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      + o_orderkey % 20 + 1 AS e
      |  FROM orders WHERE o_orderkey % 67 = 0)
      |SELECT a.oid AS id_a, b.oid AS id_b,
      |  CAST(least(a.e, b.e) - greatest(a.s, b.s) + 1 AS BIGINT)
      |    AS overlap_days
      |FROM iv a JOIN iv b ON a.oid < b.oid
      |  AND greatest(a.s, b.s) <= least(a.e, b.e)
      |ORDER BY id_a, id_b""".stripMargin

  /** GRADED-similarity record linkage: sorted-neighborhood candidate
    * pairs scored by the native codegen'd Jaro–Winkler
    * ([[graft.plans.JaroOps]] — bit-compatible with DuckDB's
    * `jaro_winkler_similarity`: same match window, transposition
    * halving, double-division order, and threshold-boost variant, so
    * the gate hash-compares RAW doubles, the k-center discipline).
    * levenshtein ≤ k is a binary screen; JW RANKS the candidates — the
    * face real linkage pipelines threshold per-domain. 0.97 splits the
    * SNB candidate set meaningfully at every SF (105/364, 1133/3964,
    * 11320/39964 pairs pass at sf0.001/0.01/0.1); blocking bounds
    * candidates at O(n·w) — the scorer never runs all-pairs. */
  def fuzzyJaroWinkler(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("cid"), col("c_name"))
    graft.operators.SortedNeighborhood.pairs(c, "cid", "c_name", w = 8)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        graft.plans.GraftExtensions.nativeFn("graft_jaro_winkler",
          col("key_a"), col("key_b")).as("jw"))
      .filter(col("jw") >= 0.97)
      .orderBy("id_a", "id_b")
  }

  val fuzzyJaroWinklerSql: String =
    """WITH c AS (SELECT c_custkey AS id, c_name AS name
      |  FROM customer WHERE c_custkey % 3 = 0),
      |r AS (SELECT id, name,
      |    ROW_NUMBER() OVER (ORDER BY name, id) AS rn FROM c),
      |p AS (SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
      |    jaro_winkler_similarity(a.name, b.name) AS jw
      |  FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn <= 8)
      |SELECT id_a, id_b, jw FROM p WHERE jw >= 0.97
      |ORDER BY id_a, id_b""".stripMargin

  val entityResolutionSnbSql: String =
    """WITH RECURSIVE c AS (SELECT c_custkey AS id, c_name AS name
      |  FROM customer WHERE c_custkey % 5 = 0),
      |r AS (SELECT id, name,
      |    ROW_NUMBER() OVER (ORDER BY name, id) AS rn FROM c),
      |e AS (SELECT least(a.id, b.id) AS a, greatest(a.id, b.id) AS b
      |  FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn <= 5
      |    AND levenshtein(a.name, b.name) <= 1),
      |und AS (SELECT a AS s, b AS t FROM e UNION SELECT b, a FROM e),
      |reach AS (SELECT s, t FROM und
      |  UNION SELECT r2.s, u.t FROM reach r2 JOIN und u ON r2.t = u.s),
      |n AS (SELECT DISTINCT s AS node FROM und)
      |SELECT n.node AS id, least(n.node, MIN(r3.t)) AS cluster
      |FROM n JOIN reach r3 ON r3.s = n.node
      |GROUP BY n.node ORDER BY id""".stripMargin

  /** The SNB pipeline again with a NORMALIZED blocking key —
    * lower-cased, punctuation stripped — via
    * [[graft.operators.SortedNeighborhood.pairsBy]]'s Column-typed
    * key: real record linkage sorts on a cleaned/phonetic key, not
    * the raw field, and exposing the key as an expression is what
    * makes the operator compose (verdict r9 item 8). The verify
    * comparator also runs on the normalized key, so the oracle ranks
    * and compares with the identical derivation. */
  def entityResolutionSnbNorm(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").filter(col("c_custkey") % 5 === 0)
      .select(col("c_custkey").as("cid"), col("c_name"))
    val normKey = lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", ""))
    val pairs = graft.operators.SortedNeighborhood
      .pairsBy(c, col("cid"), normKey, w = 5)
      .filter(levenshtein(col("key_a"), col("key_b")) <= 1)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
    Dedup.nearDupClusters(pairs).orderBy("id")
  }

  val entityResolutionSnbNormSql: String =
    """WITH RECURSIVE c AS (SELECT c_custkey AS id,
      |    lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g')) AS name
      |  FROM customer WHERE c_custkey % 5 = 0),
      |r AS (SELECT id, name,
      |    ROW_NUMBER() OVER (ORDER BY name, id) AS rn FROM c),
      |e AS (SELECT least(a.id, b.id) AS a, greatest(a.id, b.id) AS b
      |  FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn <= 5
      |    AND levenshtein(a.name, b.name) <= 1),
      |und AS (SELECT a AS s, b AS t FROM e UNION SELECT b, a FROM e),
      |reach AS (SELECT s, t FROM und
      |  UNION SELECT r2.s, u.t FROM reach r2 JOIN und u ON r2.t = u.s),
      |n AS (SELECT DISTINCT s AS node FROM und)
      |SELECT n.node AS id, least(n.node, MIN(r3.t)) AS cluster
      |FROM n JOIN reach r3 ON r3.s = n.node
      |GROUP BY n.node ORDER BY id""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_entity_resolution_snb" ->
      (entityResolutionSnb _, entityResolutionSnbSql),
    "q_entity_resolution_snb_norm" ->
      (entityResolutionSnbNorm _, entityResolutionSnbNormSql),
    "q_rank_transform" -> (rankTransform _, rankTransformSql),
    "q_histogram_equidepth" -> (histogramEquidepth _, histogramEquidepthSql),
    "q_dq_checks" -> (dqChecks _, dqChecksSql),
    "q_event_transitions" -> (eventTransitions _, eventTransitionsSql),
    "q_entity_resolution" -> (entityResolution _, entityResolutionSql),
    "q_skyline" -> (skylineCustomers _, skylineCustomersSql),
    "q_skyline3" -> (skyline3Customers _, skyline3CustomersSql),
    "q_fuzzy_join" -> (fuzzyJoinNames _, fuzzyJoinNamesSql),
    "q_fuzzy_join2" -> (fuzzyJoin2Names _, fuzzyJoin2NamesSql),
    "q_fuzzy_join_capped" -> (fuzzyJoinCapped _, fuzzyJoinCappedSql),
    "q_fuzzy_jw" -> (fuzzyJaroWinkler _, fuzzyJaroWinklerSql),
    "q_interval_join" -> (intervalJoinOrders _, intervalJoinOrdersSql),
    "q_zorder_keys" -> (zorderKeys _, zorderKeysSql),
    "q_zorder3_keys" -> (zorder3Keys _, zorder3KeysSql),
    "q_scd2_history" -> (scd2History _, scd2HistorySql),
    "q_ewma_decay" -> (ewmaDecay _, ewmaDecaySql),
    "q_mad_outliers" -> (madOutliers _, madOutliersSql),
    "q_winsorize" -> (winsorize _, winsorizeSql),
    "q_cdc_apply" -> (cdcApply _, cdcApplySql))
}
