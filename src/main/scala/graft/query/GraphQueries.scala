package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Bfs, Dedup, Hits, KCore, LabelProp, PageRank, Sssp, Triangles}
import graft.sources.Tables

/** General graph analytics over a deterministic graph derived from
  * `events` by modular arithmetic (both engines rebuild the identical
  * edge list): integer-scaled PageRank and HITS, connected
  * components, per-vertex triangle counts, multi-source BFS, bounded
  * Bellman-Ford SSSP, deterministic label propagation, and fixed-round
  * k-core peeling. Split out of [[WarehouseQueries]] (round-10 module
  * hygiene); each query carries a full rows+schema+hash DuckDB
  * oracle. */
object GraphQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- integer-scaled PageRank (iterative joins) ----

  /** Three damped PageRank iterations over a deterministic
    * 1000-node graph derived from `events` by modular arithmetic
    * (both engines rebuild the identical edge list). The engine side
    * is the generic iterative-join operator ([[PageRank.run]]) in
    * scaled integer arithmetic — order-independent sums are what
    * make a distributed iterative computation hash-certifiable; the
    * oracle unrolls the same three iterations as CTEs. */
  def pageRankEvents(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select((col("user_id") % 1000).as("src"),
        ((col("user_id") * 31 + col("event_id") * 17) % 1000).as("dst"))
      .distinct()
    PageRank.run(e, iters = 3)
      .select(col("node"), col("rank").as("pr"))
      .orderBy("node")
  }

  val pageRankEventsSql: String = {
    val scale = 1000000000000L
    val base = 15L * scale / 100L
    def round(i: Int): String =
      s"""c$i AS (SELECT e.dst AS node, SUM(r${i - 1}.pr // deg.d) AS s
         |  FROM e JOIN deg USING (src) JOIN r${i - 1} ON r${i - 1}.node = e.src
         |  GROUP BY 1),
         |r$i AS (SELECT n.node,
         |    CAST($base + (85 * COALESCE(c$i.s, 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN c$i USING (node))""".stripMargin
    s"""WITH e AS (SELECT DISTINCT user_id % 1000 AS src,
       |    (user_id * 31 + event_id * 17) % 1000 AS dst FROM events),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
       |r0 AS (SELECT node, CAST($scale AS BIGINT) AS pr FROM nodes),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT node, pr FROM r3 ORDER BY node""".stripMargin
  }


  /** PERSONALIZED PageRank ([[PageRank.runPersonalized]]): the same
    * three unrolled iterations with teleport mass restricted to seed
    * nodes {0..4} — relevance-to-seed-set ranking. The oracle carries
    * the seed indicator through the identical CTE unroll (`base` and
    * `r0` zero off-seed), so the gate pins the personalized recurrence
    * exactly, including the off-seed nodes whose rank is pure
    * propagated mass. */
  def pageRankPersonalized(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select((col("user_id") % 1000).as("src"),
        ((col("user_id") * 31 + col("event_id") * 17) % 1000).as("dst"))
      .distinct()
    val sources = s.range(5).select(col("id").as("node"))
    PageRank.runPersonalized(e, sources, iters = 3)
      .select(col("node"), col("rank").as("pr"))
      .orderBy("node")
  }

  val pageRankPersonalizedSql: String = {
    val scale = 1000000000000L
    val base = 15L * scale / 100L
    def round(i: Int): String =
      s"""c$i AS (SELECT e.dst AS node, SUM(r${i - 1}.pr // deg.d) AS s
         |  FROM e JOIN deg USING (src) JOIN r${i - 1} ON r${i - 1}.node = e.src
         |  GROUP BY 1),
         |r$i AS (SELECT n.node,
         |    CAST(CASE WHEN n.node <= 4 THEN $base ELSE 0 END
         |      + (85 * COALESCE(c$i.s, 0)) // 100 AS BIGINT) AS pr
         |  FROM nodes n LEFT JOIN c$i USING (node))""".stripMargin
    s"""WITH e AS (SELECT DISTINCT user_id % 1000 AS src,
       |    (user_id * 31 + event_id * 17) % 1000 AS dst FROM events),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
       |r0 AS (SELECT node,
       |    CAST(CASE WHEN node <= 4 THEN $scale ELSE 0 END AS BIGINT)
       |      AS pr FROM nodes),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT node, pr FROM r3 ORDER BY node""".stripMargin
  }

  // ---- general graph analytics on a derived deterministic graph ----

  /** The same modular-arithmetic edge derivation both engines can
    * rebuild, at a chosen sparsity (`every`-th event). */
  private[graft] def eventEdges(s: SparkSession, dir: String, every: Int)
      : DataFrame =
    t(s, dir, "events")
      .filter(col("event_id") % every === 0)
      .select((col("user_id") % 1000).as("src"),
        ((col("user_id") * 31 + col("event_id") * 17) % 1000).as("dst"))

  private def edgeCteSql(every: Int): String =
    s"""raw AS (SELECT user_id % 1000 AS src,
       |    (user_id * 31 + event_id * 17) % 1000 AS dst
       |  FROM events WHERE event_id % $every = 0),
       |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM raw WHERE src <> dst)""".stripMargin

  /** Connected components of a sparse undirected graph — the general
    * form of the near-dup clustering machinery: the adaptive
    * pointer-jumping label propagation ([[Dedup.nearDupClusters]])
    * runs on an arbitrary edge list, converging in
    * O(hops + log diameter) shuffle rounds. The oracle computes the
    * same min-reachable-id labels by recursive-CTE transitive
    * closure — tractable at oracle scale, certifying the distributed
    * algorithm's fixpoint on a graph with many non-trivial
    * components. */
  def graphComponents(s: SparkSession, dir: String): DataFrame = {
    val pairs = eventEdges(s, dir, every = 599)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("id_a"),
        greatest(col("src"), col("dst")).as("id_b"))
      .distinct()
    Dedup.nearDupClusters(pairs).orderBy("id")
  }

  val graphComponentsSql: String =
    s"""WITH RECURSIVE ${edgeCteSql(599)},
       |und AS (SELECT a AS s, b AS t FROM e UNION SELECT b, a FROM e),
       |reach AS (SELECT s, t FROM und
       |  UNION SELECT r.s, u.t FROM reach r JOIN und u ON r.t = u.s),
       |n AS (SELECT DISTINCT s AS node FROM und)
       |SELECT n.node AS id, least(n.node, MIN(r.t)) AS cluster
       |FROM n JOIN reach r ON r.s = n.node
       |GROUP BY n.node ORDER BY id""".stripMargin


  /** INCREMENTAL component maintenance
    * ([[Dedup.nearDupClustersIncremental]]): yesterday's clustering
    * (the every=599 graph, as q_graph_components) persisted, today's
    * batch (the every=601 graph) folded in by rewriting the new edges
    * to cluster representatives — components re-run over the
    * BATCH-sized rep graph only, never the historical edge set. The
    * oracle recomputes the full transitive closure over the UNION of
    * both edge sets, so the gate certifies that the incremental path
    * lands on exactly the full-recompute labels (merges, attachments,
    * and untouched clusters alike). */
  def graphComponentsInc(s: SparkSession, dir: String): DataFrame = {
    def pairsAt(every: Int) = eventEdges(s, dir, every)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("id_a"),
        greatest(col("src"), col("dst")).as("id_b"))
      .distinct()
    val oldLabels = Dedup.nearDupClusters(pairsAt(599))
    Dedup.nearDupClustersIncremental(oldLabels, pairsAt(601))
      .orderBy("id")
  }

  val graphComponentsIncSql: String =
    s"""WITH RECURSIVE raw AS (SELECT user_id % 1000 AS src,
       |    (user_id * 31 + event_id * 17) % 1000 AS dst
       |  FROM events WHERE event_id % 599 = 0 OR event_id % 601 = 0),
       |e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM raw WHERE src <> dst),
       |und AS (SELECT a AS s, b AS t FROM e UNION SELECT b, a FROM e),
       |reach AS (SELECT s, t FROM und
       |  UNION SELECT r.s, u.t FROM reach r JOIN und u ON r.t = u.s),
       |n AS (SELECT DISTINCT s AS node FROM und)
       |SELECT n.node AS id, least(n.node, MIN(r.t)) AS cluster
       |FROM n JOIN reach r ON r.s = n.node
       |GROUP BY n.node ORDER BY id""".stripMargin

  /** Per-vertex triangle counts under degree-ranked orientation
    * ([[Triangles.perNode]] — the √m wedge bound that survives
    * celebrity vertices); the oracle enumerates canonical `x<y<z`
    * triangles with the plain three-way self-join. */
  def graphTriangles(s: SparkSession, dir: String): DataFrame =
    Triangles.perNode(eventEdges(s, dir, every = 3))
      .orderBy("node")

  val graphTrianglesSql: String =
    s"""WITH ${edgeCteSql(3)},
       |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM e e1
       |  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
       |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
       |corners AS (SELECT x AS node FROM tri
       |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
       |SELECT node, COUNT(*) AS n_triangles FROM corners
       |GROUP BY 1 ORDER BY node""".stripMargin

  /** Multi-source BFS hop distances ([[graft.operators.Bfs.hops]])
    * over the event-derived directed graph (denser fixture than the
    * components one — avg out-degree ~6, so waves actually propagate
    * at every SF): dist = min directed hops from sources {0..4},
    * capped at 6; unreached nodes absent. The oracle explores the
    * same bounded walk as a recursive CTE and takes MIN(dist) —
    * exact integers, full hash gate. */
  def graphBfs(s: SparkSession, dir: String): DataFrame = {
    val e = eventEdges(s, dir, every = 17).distinct()
    val sources = s.range(5).select(col("id").as("node"))
    Bfs.hops(e, sources, maxHops = 6).orderBy("node")
  }

  val graphBfsSql: String =
    s"""WITH RECURSIVE raw AS (SELECT user_id % 1000 AS src,
       |    (user_id * 31 + event_id * 17) % 1000 AS dst
       |  FROM events WHERE event_id % 17 = 0),
       |e AS (SELECT DISTINCT src, dst FROM raw),
       |walk AS (SELECT CAST(x AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
       |    FROM (VALUES (0), (1), (2), (3), (4)) t(x)
       |  UNION
       |  SELECT e.dst, w.dist + 1 FROM walk w
       |  JOIN e ON e.src = w.node WHERE w.dist < 6)
       |SELECT node, MIN(dist) AS dist FROM walk
       |GROUP BY node ORDER BY node""".stripMargin

  /** Bounded-depth weighted shortest paths
    * ([[graft.operators.Sssp.bounded]] — distributed Bellman-Ford)
    * over the event-derived directed graph (every=5 — denser than the
    * BFS fixture so single-digit sources propagate at sf0.001 too:
    * 39/396/600 reached nodes at sf0.001/0.01/0.1, measured), with a
    * deterministic integer weight `(src*7 + dst*13) % 9 + 1` both
    * engines rebuild: dist = min cost over walks of <= 5 edges from
    * sources {0,1,2}. Exact integer distances, full hash gate; the oracle
    * enumerates the bounded walk space as a recursive CTE (dedup on
    * (node, dist, hops) keeps it finite) and takes MIN(dist). The
    * weight range is deliberately small (1..9) to bound the oracle's
    * reachable-state space; the Spark operator is indifferent. */
  def graphSssp(s: SparkSession, dir: String): DataFrame = {
    val e = eventEdges(s, dir, every = 5).distinct()
      .withColumn("w", (col("src") * 7 + col("dst") * 13) % 9 + 1)
    val sources = s.range(3).select(col("id").as("node"))
    Sssp.bounded(e, sources, maxHops = 5).orderBy("node")
  }

  val graphSsspSql: String =
    s"""WITH RECURSIVE raw AS (SELECT user_id % 1000 AS src,
       |    (user_id * 31 + event_id * 17) % 1000 AS dst
       |  FROM events WHERE event_id % 5 = 0),
       |e AS (SELECT DISTINCT src, dst,
       |    (src * 7 + dst * 13) % 9 + 1 AS w FROM raw),
       |walk AS (SELECT CAST(x AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist,
       |    0 AS hops
       |  FROM (VALUES (0), (1), (2)) t(x)
       |  UNION
       |  SELECT e.dst, w.dist + e.w, w.hops + 1 FROM walk w
       |  JOIN e ON e.src = w.node WHERE w.hops < 5)
       |SELECT node, MIN(dist) AS dist FROM walk
       |GROUP BY node ORDER BY node""".stripMargin

  /** Deterministic label-propagation communities
    * ([[graft.operators.LabelProp.run]]) — 3 synchronous rounds over
    * the undirected every=11 graph, most-frequent-neighbor-label
    * updates with smallest-label tie-break (randomized tie-break is
    * what makes textbook LPA irreproducible; pinning it makes the run
    * hash-certifiable). The oracle unrolls the same 3 rounds as CTEs
    * with the identical window tie-break. */
  def graphLabelProp(s: SparkSession, dir: String): DataFrame = {
    val e = eventEdges(s, dir, every = 11)
    LabelProp.run(e, rounds = 3).orderBy("node")
  }

  val graphLabelPropSql: String = {
    def round(i: Int): String =
      s"""v$i AS (SELECT u.t AS node, l.label, COUNT(*) AS c
         |  FROM und u JOIN l${i - 1} l ON l.node = u.s GROUP BY 1, 2),
         |w$i AS (SELECT node, label FROM (
         |    SELECT node, label, ROW_NUMBER() OVER (PARTITION BY node
         |      ORDER BY c DESC, label ASC) AS rn FROM v$i)
         |  WHERE rn = 1),
         |l$i AS (SELECT l.node, COALESCE(w.label, l.label) AS label
         |  FROM l${i - 1} l LEFT JOIN w$i w ON w.node = l.node)"""
        .stripMargin
    s"""WITH raw AS (SELECT user_id % 1000 AS src,
       |    (user_id * 31 + event_id * 17) % 1000 AS dst
       |  FROM events WHERE event_id % 11 = 0),
       |e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
       |und AS (SELECT src AS s, dst AS t FROM e
       |  UNION SELECT dst, src FROM e),
       |l0 AS (SELECT DISTINCT s AS node, s AS label FROM und),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT node, label FROM l3 ORDER BY node""".stripMargin
  }

  /** Integer-scaled HITS hubs/authorities
    * ([[graft.operators.Hits.run]], 2 iterations, max-entry rescale at
    * scale 10^6) over the directed every=3 graph. The max-rescale
    * replaces the L2 norm precisely because integer division is
    * summation-order-independent — what lets the unrolled-CTE oracle
    * certify a shuffled distributed run value-for-value. */
  def graphHits(s: SparkSession, dir: String): DataFrame = {
    val e = eventEdges(s, dir, every = 3).distinct()
    Hits.run(e, iters = 2).orderBy("node")
  }

  val graphHitsSql: String = {
    val sc = 1000000L
    def iter(i: Int): String =
      s"""ar$i AS (SELECT e.dst AS node, SUM(h${i - 1}.hub) AS raw
         |  FROM e JOIN h${i - 1} ON h${i - 1}.node = e.src GROUP BY 1),
         |a$i AS (SELECT n.node,
         |    (COALESCE(ar$i.raw, 0) * $sc) // (SELECT MAX(raw) FROM ar$i)
         |      AS auth
         |  FROM nodes n LEFT JOIN ar$i USING (node)),
         |hr$i AS (SELECT e.src AS node, SUM(a$i.auth) AS raw
         |  FROM e JOIN a$i ON a$i.node = e.dst GROUP BY 1),
         |h$i AS (SELECT n.node,
         |    (COALESCE(hr$i.raw, 0) * $sc) // (SELECT MAX(raw) FROM hr$i)
         |      AS hub
         |  FROM nodes n LEFT JOIN hr$i USING (node))""".stripMargin
    s"""WITH e AS (SELECT DISTINCT user_id % 1000 AS src,
       |    (user_id * 31 + event_id * 17) % 1000 AS dst
       |  FROM events WHERE event_id % 3 = 0),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |h0 AS (SELECT node, CAST($sc AS BIGINT) AS hub FROM nodes),
       |${iter(1)},
       |${iter(2)}
       |SELECT h2.node, CAST(h2.hub AS BIGINT) AS hub,
       |  CAST(COALESCE(a2.auth, 0) AS BIGINT) AS auth
       |FROM h2 LEFT JOIN a2 ON a2.node = h2.node
       |ORDER BY 1""".stripMargin
  }

  /** Fixed-round 5-core peeling ([[graft.operators.KCore.peel]], 6
    * synchronous rounds) over the undirected every=3 graph — the
    * dense-subgraph screen. Output: survivors with their degree inside
    * the surviving subgraph. The oracle unrolls the identical 6
    * degree-filter rounds; both sides run the FIXED round count, so
    * the gate certifies the synchronous peel semantics exactly even
    * where 6 rounds is or isn't the fixpoint. */
  def graphKcore(s: SparkSession, dir: String): DataFrame = {
    val e = eventEdges(s, dir, every = 3)
    KCore.peel(e, k = 5, rounds = 6).orderBy("node")
  }

  val graphKcoreSql: String = {
    def round(i: Int): String =
      s"""d$i AS (SELECT u.s AS node, COUNT(*) AS d FROM und u
         |  JOIN n${i - 1} x ON u.s = x.node
         |  JOIN n${i - 1} y ON u.t = y.node GROUP BY 1),
         |n$i AS (SELECT node FROM d$i WHERE d >= 5)""".stripMargin
    s"""WITH raw AS (SELECT user_id % 1000 AS src,
       |    (user_id * 31 + event_id * 17) % 1000 AS dst
       |  FROM events WHERE event_id % 3 = 0),
       |e AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
       |und AS (SELECT src AS s, dst AS t FROM e
       |  UNION SELECT dst, src FROM e),
       |n0 AS (SELECT DISTINCT s AS node FROM und),
       |${(1 to 6).map(round).mkString(",\n")},
       |df AS (SELECT u.s AS node, COUNT(*) AS core_deg FROM und u
       |  JOIN n6 x ON u.s = x.node
       |  JOIN n6 y ON u.t = y.node GROUP BY 1)
       |SELECT node, core_deg FROM df ORDER BY node""".stripMargin
  }

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_pagerank" -> (pageRankEvents _, pageRankEventsSql),
    "q_pagerank_personalized" ->
      (pageRankPersonalized _, pageRankPersonalizedSql),
    "q_graph_components" -> (graphComponents _, graphComponentsSql),
    "q_graph_components_inc" ->
      (graphComponentsInc _, graphComponentsIncSql),
    "q_graph_bfs" -> (graphBfs _, graphBfsSql),
    "q_graph_sssp" -> (graphSssp _, graphSsspSql),
    "q_graph_triangles" -> (graphTriangles _, graphTrianglesSql),
    "q_graph_label_prop" -> (graphLabelProp _, graphLabelPropSql),
    "q_graph_hits" -> (graphHits _, graphHitsSql),
    "q_graph_kcore" -> (graphKcore _, graphKcoreSql))
}
