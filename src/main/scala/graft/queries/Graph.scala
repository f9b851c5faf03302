package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over a co-occurrence graph: triangle counting with
  * degree-ordered orientation.
  *
  * The graph: parts are nodes; an edge connects two parts that appear in
  * the same order (the co-purchase graph lineitem induces). Triangle
  * participation is the classic cohesion signal (clustering coefficient
  * numerator, community density, spam/bot subgraph detection).
  *
  * Scale design — the two places a naive plan dies at 100 TB, and the
  * standard fixes, both used here:
  *
  *   1. Pair generation. Edges are built per order GROUP (collect_set +
  *      higher-order pair expansion), never by a corpus-wide self-join:
  *      cost is O(k²) per order with k bounded by order size, and the
  *      expansion runs scan-locally after one group-by shuffle.
  *   2. Wedge explosion. Counting by joining raw adjacency squares the
  *      max degree (a single hub node generates deg² wedge rows). The
  *      degree-ordered orientation (edge points from the (deg,id)-smaller
  *      endpoint to the larger) caps every node's OUT-degree at O(√m) on
  *      any graph, so the wedge join — out-neighbors of the common src,
  *      ordered by the composite rank to count each triangle exactly
  *      once — is bounded by m^{3/2} total work regardless of skew. This
  *      is the standard MapReduce triangle algorithm (Suri & Vassilvitskii,
  *      WWW'11), expressed as three declarative joins Catalyst plans with
  *      partial aggregation and AQE.
  *
  * Everything is exact integer arithmetic (composite rank = deg·2⁴⁰ + id,
  * unique while id < 2⁴⁰ and deg < 2²³), reproduced
  * operator-for-operator in DuckDB, so the per-node triangle counts are
  * hash-gated.
  */
object Graph {

  /** Distinct co-purchase edges (u < v), built per order group. Memoized +
    * checkpointed: the edge list is the shared artifact of the whole graph
    * family (degrees, orientation, wedge join all read it; without the
    * checkpoint every downstream self-join recomputes the group-by +
    * pair-expansion pipeline once per consumer). */
  private def edgesOf(spark: SparkSession, dir: String): DataFrame =
    Memo("graph_edges", spark, dir) {
      // order-keyed repartition to session parallelism before the group
      // + pair expansion: AQE's byte-based coalescing sizes the
      // post-shuffle stage for the ~10 MB of (o, p) rows and runs the
      // whole Σ basket² expansion + distinct partials on 2-3 tasks.
      // Gated like Tables.spread (single-file local inputs only); a
      // user-specified keyed exchange both pins the task count and
      // satisfies the groupBy's distribution, so no second exchange.
      val src = Tables(spark, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      Tables.spreadBy(spark, dir, "lineitem", src, col("o"))
        .groupBy(col("o")).agg(sort_array(collect_set(col("p"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps,
            |  (x, i) -> transform(slice(ps, i + 2, size(ps)),
            |    y -> struct(x AS u, y AS v))))""".stripMargin)).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .distinct()
        .localCheckpoint()
    }

  private def degOf(edges: DataFrame): DataFrame =
    edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))

  /** Degree table, memoized + checkpointed, for q140 ONLY: PageRank
    * consumes it three times per run (the contribEdges build, the
    * rank-join gate count, the initial ranks), each previously a full
    * union+groupBy over the edge list. |V| rows. The OTHER deg consumers
    * (q127's rank, q127b's coefficient join, q130's seeds) deliberately
    * stay on the LAZY [[degOf]]: a `localCheckpoint`ed frame is a
    * LogicalRDD with NO size statistics, and feeding it into their join
    * subtrees flips downstream broadcast decisions to sort-merge
    * (measured: q127 4.0 → 5.8 s, q130 4.4 → 7.9 s when they read the
    * checkpoint). q140's consumers are estimate-safe — its rank join is
    * explicitly gated broadcast/shuffle-hash, never estimate-planned. */
  private def degCk(spark: SparkSession, dir: String): DataFrame =
    Memo("graph_deg", spark, dir) {
      degOf(edgesOf(spark, dir)).localCheckpoint()
    }

  /** Oriented edge list (src = (deg,id)-smaller endpoint), memoized +
    * checkpointed: the wedge join consumes it THREE times (both wedge
    * sides + the closing-edge probe). */
  private def orientedOf(spark: SparkSession, dir: String): DataFrame =
    Memo("graph_oriented", spark, dir) {
      val edges = edgesOf(spark, dir)
      // composite (deg, id) rank as d·2^40 + node — unique while
      // node < 2^40 and deg < 2^23 (a 10^6 multiplier breaks at node ids
      // ≥ 10^6: rank ties silently desync the strict-ordered oracle wedge
      // join from the intersection form)
      val rank = degOf(edges)
        .select(col("node"),
          (col("d") * 1099511627776L + col("node")).as("rk"))
      edges
        .join(rank.select(col("node").as("u"), col("rk").as("ru")), Seq("u"))
        .join(rank.select(col("node").as("v"), col("rk").as("rv")), Seq("v"))
        .select(
          when(col("ru") < col("rv"), col("u")).otherwise(col("v")).as("src"),
          when(col("ru") < col("rv"), col("v")).otherwise(col("u")).as("dst"),
          greatest(col("ru"), col("rv")).as("rdst"))
        .localCheckpoint()
    }

  /** Conservative bytes-per-oriented-edge estimate for the broadcast
    * adjacency table: each oriented edge contributes one 8-byte long to
    * some node's out-neighbor array, plus its amortized share of row +
    * array headers. On a degree-1-heavy graph every adjacency row is
    * header-dominated (~48 B serialized per UnsafeRow + array header) and
    * the in-memory HashedRelation expands further, so 64 B/edge keeps the
    * estimate above the true footprint on every layout — the gate errs
    * toward the shuffle-safe wedge join. */
  private val AdjBytesPerEdge = 64L

  /** Default broadcast budget for the adjacency table (per exchange; the
    * plan ships it twice). 128 MB stays an order of magnitude under
    * typical executor/driver headroom while letting every realistic
    * single-node graph (m ≲ 4M oriented edges) take the fast path. */
  private val DefaultAdjBroadcastBytes = 128L << 20

  /** Per-node triangle counts, with the physical strategy SIZE-GATED at
    * plan time: below the broadcast budget, ADJACENCY-SET INTERSECTION
    * over the oriented DAG — a triangle with rank order a<b<c is found
    * exactly once, at its lowest edge a→b, as c ∈ N⁺(a) ∩ N⁺(b). The
    * per-src out-neighbor arrays are bounded by the orientation
    * (out-degree ≤ O(√m), 97 at sf0.1), so the adjacency table is |V|
    * rows and BROADCASTS; the intersection then runs scan-local over the
    * edge list — the Σ outdeg² wedge stream (41M rows at sf0.1) is never
    * shuffled, only the |triangles| closures materialize.
    *
    * Past the budget (m·64 B > `graft.graph.adjacencyBroadcastBytes`,
    * default 128 MB — the |V|·√m cliff the broadcast path hits at ~100×
    * sf0.1), the plan AUTOMATICALLY falls back to the equivalent
    * three-way oriented wedge join (the oracle SQL's own form): all
    * exchanges are hash shuffles that scale horizontally, total work
    * still m^{3/2}-bounded by the orientation. The two paths enumerate
    * provably the same triple set {(a,b,c) : rank a<b<c, all edges
    * present}; `GraphSpec` executes BOTH against closed-form graphs and
    * the gate itself. `graft.graph.triangleImpl` = auto|broadcast|wedge
    * pins a path explicitly (tests; operators who know their graph). The
    * sizing count is one cheap job over the memoized CHECKPOINTED
    * oriented edge list — no extra lineage, no full recompute. */
  private def triCounts(spark: SparkSession, dir: String): DataFrame = {
    val oriented = orientedOf(spark, dir)
    val impl = spark.conf.get("graft.graph.triangleImpl", "auto")
    val useBroadcast = impl match {
      case "broadcast" => true
      case "wedge"     => false
      case "auto" =>
        val key = "graft.graph.adjacencyBroadcastBytes"
        val raw = spark.conf.get(key, DefaultAdjBroadcastBytes.toString)
        val budget =
          try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
          catch { case e: NumberFormatException =>
            throw new IllegalArgumentException(
              s"$key must be a byte count (plain or suffixed, e.g. " +
                s"134217728 or 128m); got '$raw'", e)
          }
        oriented.count() * AdjBytesPerEdge <= budget
      case other => throw new IllegalArgumentException(
        s"graft.graph.triangleImpl must be auto, broadcast, or wedge; " +
          s"got '$other'")
    }
    // the per-node counts are memoized + checkpointed like the edge list
    // they derive from: q127 AND q127b both need them, and without the
    // memo q127b re-ran the whole wedge/intersection pass. Keyed by the
    // CHOSEN impl so an explicit `graft.graph.triangleImpl` pin (tests,
    // operators) still executes its path rather than serving the other's
    // cached counts. |V| rows; q127b's left join against the checkpoint
    // is |V|⋈|V| (both tiny relative to the edge list), so the
    // LogicalRDD no-stats caveat that kept degCk out of q127b's DEG side
    // does not bite on the counts side.
    Memo(s"graph_tricnt_${if (useBroadcast) "b" else "w"}", spark, dir) {
      val tri =
        if (useBroadcast) triplesByIntersection(oriented)
        else triplesByWedgeJoin(oriented)
      tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("tri_cnt"))
        .localCheckpoint()
    }
  }

  /** Broadcast path: (x, y, z) triangle triples via set intersection of
    * the two endpoints' broadcast out-neighbor arrays. The intersection is
    * the native sorted-merge expression, not `array_intersect`: both
    * adjacency arrays are sorted and distinct by construction
    * (`sort_array(collect_list)` over distinct edges), and the per-edge
    * hash-set build `array_intersect` does was the hot loop of the whole
    * query (Σ outdeg² probed elements). Same result under that contract
    * (`GraphSpec` pins both forms against each other). */
  private def triplesByIntersection(oriented: DataFrame): DataFrame = {
    val adj = oriented.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    oriented
      .join(broadcast(adj.select(col("src").as("au"), col("nbrs").as("nu"))),
        col("src") === col("au"))
      .join(broadcast(adj.select(col("src").as("av"), col("nbrs").as("nv"))),
        col("dst") === col("av"))
      .select(col("src").as("x"), col("dst").as("y"),
        explode(graft.functions.sorted_intersect_l(col("nu"), col("nv")))
          .as("z"))
  }

  /** Shuffle path: the same (x, y, z) triple set by the three-way
    * oriented wedge join — wedges (x→y, x→z with rank y < z) closed by
    * probing the y→z edge. Every join is a plain hash shuffle on graph
    * keys; no broadcast, no driver-sized structure, so the path survives
    * any |V|. Work bound: Σ outdeg² ≤ m^{3/2} wedge rows (Suri &
    * Vassilvitskii, WWW'11), shuffled once for the closing probe.
    *
    * The closing probe is HINTED shuffled-hash: the build side is the
    * m-row edge list (bounded per partition), and the m^{3/2}-row wedge
    * stream then FLOWS through the probe unsorted. Unhinted, Spark
    * sort-merges — sorting the wedge stream, the one corpus-scale
    * intermediate this plan has: measured at sf1, the sort spilled
    * 19.3 GB for a 4.6 GB shuffle (and at sf10 the 10× spill exceeded
    * the test box's scratch disk outright); with the hint the spill
    * term is gone and only the shuffle write scales with the wedge
    * count. */
  private def triplesByWedgeJoin(oriented: DataFrame): DataFrame = {
    val e1 = oriented.select(
      col("src").as("x"), col("dst").as("y"), col("rdst").as("r1"))
    val e2 = oriented.select(
      col("src").as("s2"), col("dst").as("z"), col("rdst").as("r2"))
    val closing = oriented.select(col("src").as("cy"), col("dst").as("cz"))
    e1.join(e2, col("x") === col("s2") && col("r1") < col("r2"))
      .join(closing.hint("shuffle_hash"),
        col("y") === col("cy") && col("z") === col("cz"))
      .select(col("x"), col("y"), col("z"))
  }

  /** q127: per-node triangle counts of the part co-purchase graph. */
  def triangles(spark: SparkSession, dir: String): DataFrame =
    triCounts(spark, dir)

  /** q127b: local clustering coefficient — the fraction of a node's
    * neighbor pairs that are themselves connected, as the exact integer
    * `2·tri·10⁶ div d·(d−1)` (ppm; no float ever computed). Nodes with
    * degree ≥ 2 but NO triangles appear with 0 — the left join against the
    * degree table is what q127 alone cannot express. Same m^{3/2}-bounded
    * wedge machinery; one extra |V|-sized join. */
  def clusteringCoeff(spark: SparkSession, dir: String): DataFrame = {
    val deg = degOf(edgesOf(spark, dir))
    deg.where(col("d") >= 2)
      .join(triCounts(spark, dir), Seq("node"), "left")
      .select(col("node"), col("d"),
        coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"),
        expr("coalesce(tri_cnt, 0) * 2 * 1000000 div (d * (d - 1))")
          .as("cc_ppm"))
  }

  private val trianglesSql =
    """WITH op AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |edges AS (
      |  SELECT DISTINCT a.p AS u, b.p AS v
      |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
      |deg AS (
      |  SELECT node, count(*) AS d FROM (
      |    SELECT u AS node FROM edges
      |    UNION ALL SELECT v AS node FROM edges) n GROUP BY 1),
      |rk AS (SELECT node, d * 1099511627776 + node AS rk FROM deg),
      |orient AS (
      |  SELECT CASE WHEN ru.rk < rv.rk THEN e.u ELSE e.v END AS src,
      |         CASE WHEN ru.rk < rv.rk THEN e.v ELSE e.u END AS dst,
      |         greatest(ru.rk, rv.rk) AS rdst
      |  FROM edges e
      |  JOIN rk ru ON e.u = ru.node JOIN rk rv ON e.v = rv.node),
      |tri AS (
      |  SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
      |  FROM orient e1
      |  JOIN orient e2 ON e1.src = e2.src AND e1.rdst < e2.rdst
      |  JOIN orient e3 ON e3.src = e1.dst AND e3.dst = e2.dst)
      |SELECT node, count(*) AS tri_cnt FROM (
      |  SELECT x AS node FROM tri
      |  UNION ALL SELECT y AS node FROM tri
      |  UNION ALL SELECT z AS node FROM tri) t
      |GROUP BY 1""".stripMargin

  /** q130: multi-source BFS hop distances (≤ 3 hops) from a deterministic
    * seed set over the undirected co-purchase graph — the iterative-
    * traversal pattern (reachability, blast-radius, influence fronts)
    * driven from the driver loop the way every Pregel-style computation
    * is. Each round: frontier ⋈ edges (one shuffle keyed on the node),
    * minus already-labeled nodes (anti join) so the frontier NEVER regrows
    * into visited territory — on a high-diameter graph that pruning is the
    * difference between |V| total frontier work and |V|·rounds. Hop count
    * bounded (3) keeps the driver loop fixed-length — plan size is static,
    * no lineage growth (each round is a fresh DataFrame off the memoized
    * checkpointed edge list). */
  def bfsHops(spark: SparkSession, dir: String): DataFrame = {
    val edges = edgesOf(spark, dir)
    val und = edges.select(col("u").as("a"), col("v").as("b"))
      .unionAll(edges.select(col("v").as("a"), col("u").as("b")))
    val seeds = degOf(edges).select(col("node"))
      .where(col("node") % 500 === 0)
    var labeled = seeds.withColumn("dist", lit(0L))
    var frontier = seeds
    for (k <- 1 to 3) {
      // checkpoint each round: the anti join reads labeled_{k-1} and the
      // next round reads frontier_k, so an unchecked plan re-embeds every
      // prior round's join on BOTH sides — ~2^k recompute, not k
      val next = und.join(frontier, col("a") === col("node"))
        .select(col("b").as("node")).distinct()
        .join(labeled.select(col("node")), Seq("node"), "left_anti")
        .localCheckpoint()
      frontier = next
      labeled = labeled.unionAll(next.withColumn("dist", lit(k.toLong)))
    }
    labeled
  }

  private val bfsHopsSql =
    """WITH op AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |edges AS (
      |  SELECT DISTINCT a.p AS u, b.p AS v
      |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
      |und AS (
      |  SELECT u AS a, v AS b FROM edges
      |  UNION ALL SELECT v AS a, u AS b FROM edges),
      |nodes AS (
      |  SELECT DISTINCT a AS node FROM und),
      |d0 AS (SELECT node FROM nodes WHERE node % 500 = 0),
      |d1 AS (SELECT DISTINCT e.b AS node FROM und e JOIN d0 ON e.a = d0.node),
      |d2 AS (SELECT DISTINCT e.b AS node FROM und e JOIN d1 ON e.a = d1.node),
      |d3 AS (SELECT DISTINCT e.b AS node FROM und e JOIN d2 ON e.a = d2.node)
      |SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
      |  SELECT node, 0 AS dist FROM d0
      |  UNION ALL SELECT node, 1 FROM d1
      |  UNION ALL SELECT node, 2 FROM d2
      |  UNION ALL SELECT node, 3 FROM d3) t
      |GROUP BY node""".stripMargin

  /** q140: PageRank over the undirected co-purchase graph — 3 power
    * iterations, damping 0.85, in EXACT INTEGER FIXED-POINT (rank scaled
    * by 10⁹; contribution = rank div degree, update = 0.15·10⁹ +
    * (85·Σcontrib) div 100). Floating-point PageRank can never hash-match
    * across engines (partition-order accumulation); floor-division
    * fixed-point makes every iteration a pure integer function of the
    * previous one, bit-identical in Spark and DuckDB.
    *
    * Scale shape: each iteration shuffles only the |V|-row rank table
    * (join keyed on the contributing endpoint against the memoized
    * CHECKPOINTED edge list, then one partial-aggregated groupBy on the
    * receiving endpoint). The corpus-sized edge list is built once and
    * reused; rank is `localCheckpoint`ed per round so the plan stays
    * linear in iterations instead of re-embedding every prior round.
    * Undirected symmetry means no dangling-mass term (every node has
    * out-degree ≥ 1) and no node misses an update. Overflow bound:
    * 85·Σ(contrib) < 2⁶² while |V| < 10⁸ at the 10⁹ scale — DuckDB
    * checks, Java would wrap, so the scale is chosen to keep both exact
    * (the [[graft-oracle-determinism]] 2⁶² rule).
    *
    * Reference ties: the iterative refine loop is the same driver-side
    * iteration pattern the reference's master re-runs jobs with
    * (framework-src/MasterNode.java); PageRank itself is the canonical
    * "MapReduce iteration" workload (Page et al. 1999; Malewicz et al.
    * Pregel, SIGMOD'10). */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val edges = edgesOf(spark, dir)
    val und = edges.select(col("u").as("a"), col("v").as("b"))
      .unionAll(edges.select(col("v").as("a"), col("u").as("b")))
    val deg = degCk(spark, dir).select(col("node").as("dn"), col("d"))
    // Degree-annotated edges built ONCE and checkpointed — referenced by
    // all three iterations, so without the checkpoint the union+join
    // pipeline would recompute per round. The rank-join shape is gated
    // below: broadcast under the budget, shuffled-hash (rank as build)
    // above it — the Pregel co-partitioned layout, selected by one cheap
    // |V| count exactly like q127's adjacency gate.
    val contribEdges = Memo("graph_contrib", spark, dir) {
      und.join(deg, col("a") === col("dn"))
        .select(col("a"), col("b"), col("d"))
        .localCheckpoint()
    }
    // The rank join's physical shape is size-gated like q127's adjacency:
    // under the budget the |V|-row rank table broadcasts onto the edge
    // scan (zero edge movement); above it (sf10's 2M-node slice crossed
    // the AQE threshold and fell back to sort-merge, which re-SORTED the
    // 120M-row edge table in every iteration) the join is hinted
    // shuffled-hash with RANK as the build side — the edge stream flows
    // unsorted, its exchange is canonical-identical across iterations
    // (ReusedExchange), and per-iteration cost is one |V|-row exchange +
    // hash build. The same lesson as the q127 wedge closing probe: never
    // let the corpus-scale stream be the sorted side.
    val rankBytesPerNode = 32L
    val budget = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("graft.graph.adjacencyBroadcastBytes",
        DefaultAdjBroadcastBytes.toString))
    val rankBroadcasts = deg.count() * rankBytesPerNode <= budget
    var rank = deg.select(col("dn").as("node"), lit(1000000000L).as("pr"))
    for (_ <- 1 to 3) {
      val rk = if (rankBroadcasts) broadcast(rank) else rank.hint("shuffle_hash")
      rank = contribEdges
        .join(rk, col("a") === col("node"))
        .select(col("b"), expr("pr div d").as("contrib"))
        .groupBy(col("b"))
        .agg(sum(col("contrib")).as("s"))
        .select(col("b").as("node"),
          (lit(150000000L) + expr("85 * s div 100")).as("pr"))
    }
    // No per-round checkpoint, deliberately: each round references the
    // previous rank exactly ONCE, so the lazy plan grows linearly in
    // iterations (contrast q130's BFS, where labeled+frontier double-
    // reference forces per-round cuts) and the whole 3-round pipeline
    // runs as one job with no intermediate materialization.
    rank
  }

  private val pageRankSql =
    """WITH op AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |edges AS (
      |  SELECT DISTINCT a.p AS u, b.p AS v
      |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
      |und AS (
      |  SELECT u AS a, v AS b FROM edges
      |  UNION ALL SELECT v AS a, u AS b FROM edges),
      |deg AS (SELECT a AS node, count(*) AS d FROM und GROUP BY 1),
      |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS pr FROM deg),
      |r1 AS (
      |  SELECT e.b AS node,
      |    CAST(150000000 + (85 * sum(r.pr // g.d)) // 100 AS BIGINT) AS pr
      |  FROM und e JOIN r0 r ON e.a = r.node JOIN deg g ON e.a = g.node
      |  GROUP BY e.b),
      |r2 AS (
      |  SELECT e.b AS node,
      |    CAST(150000000 + (85 * sum(r.pr // g.d)) // 100 AS BIGINT) AS pr
      |  FROM und e JOIN r1 r ON e.a = r.node JOIN deg g ON e.a = g.node
      |  GROUP BY e.b),
      |r3 AS (
      |  SELECT e.b AS node,
      |    CAST(150000000 + (85 * sum(r.pr // g.d)) // 100 AS BIGINT) AS pr
      |  FROM und e JOIN r2 r ON e.a = r.node JOIN deg g ON e.a = g.node
      |  GROUP BY e.b)
      |SELECT node, pr FROM r3""".stripMargin

  private val clusteringCoeffSql =
    """WITH op AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |edges AS (
      |  SELECT DISTINCT a.p AS u, b.p AS v
      |  FROM op a JOIN op b ON a.o = b.o AND a.p < b.p),
      |deg AS (
      |  SELECT node, count(*) AS d FROM (
      |    SELECT u AS node FROM edges
      |    UNION ALL SELECT v AS node FROM edges) n GROUP BY 1),
      |rk AS (SELECT node, d * 1099511627776 + node AS rk FROM deg),
      |orient AS (
      |  SELECT CASE WHEN ru.rk < rv.rk THEN e.u ELSE e.v END AS src,
      |         CASE WHEN ru.rk < rv.rk THEN e.v ELSE e.u END AS dst,
      |         greatest(ru.rk, rv.rk) AS rdst
      |  FROM edges e
      |  JOIN rk ru ON e.u = ru.node JOIN rk rv ON e.v = rv.node),
      |tri AS (
      |  SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
      |  FROM orient e1
      |  JOIN orient e2 ON e1.src = e2.src AND e1.rdst < e2.rdst
      |  JOIN orient e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
      |tc AS (
      |  SELECT node, count(*) AS tri_cnt FROM (
      |    SELECT x AS node FROM tri
      |    UNION ALL SELECT y AS node FROM tri
      |    UNION ALL SELECT z AS node FROM tri) t
      |  GROUP BY 1)
      |SELECT g.node, g.d, CAST(coalesce(tc.tri_cnt, 0) AS BIGINT) AS tri_cnt,
      |  CAST(coalesce(tc.tri_cnt, 0) * 2 * 1000000 // (g.d * (g.d - 1))
      |    AS BIGINT) AS cc_ppm
      |FROM deg g LEFT JOIN tc ON g.node = tc.node
      |WHERE g.d >= 2""".stripMargin

  // ---- q260: bounded weighted shortest paths ------------------------------

  /** q260: WEIGHTED SSSP, HOP-BOUNDED — Bellman-Ford as it actually runs
    * distributed: K synchronized relaxation sweeps (K=6), each one
    * edge-keyed join + min-aggregate; after sweep k every distance is
    * exactly min over paths of ≤ k edges, so the OUTPUT CONTRACT is
    * "shortest distance within 6 hops" — well-defined, engine-exact,
    * and precisely what the recursive oracle computes (an unbounded
    * Dijkstra result can't be graded without convergence detection;
    * BFS q130 already demonstrates the fixed-point variant, unweighted).
    * Subgraph = co-purchase edges among parts < 500 (the oracle's
    * recursive CTE enumerates (node, dist, hops) triples — bounded here,
    * exponential on the full graph); weights 1 + (u+v) mod 3 derive
    * deterministically from the keys.
    *
    * At 100 TB: each sweep shuffles on edge source — K scans of the edge
    * list with map-side min partials, the Pregel cost model; the
    * distance frame stays |reachable-nodes|-sized and localCheckpoint
    * cuts lineage per round (the q130/q140 discipline). */
  def sssp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val half = edgesOf(spark, dir)
      .where(col("u") < 500 && col("v") < 500)
    val edges = half.select(col("u").as("a"), col("v").as("b"))
      .union(half.select(col("v").as("a"), col("u").as("b")))
      .withColumn("w", lit(1L) + pmod(col("a") + col("b"), lit(3)))
      .localCheckpoint()
    val seed = edges.agg(min(col("a"))).head().getLong(0)
    var dist = Seq((seed, 0L)).toDF("node", "d")
    for (_ <- 1 to 6) {
      val relax = dist.join(edges, dist("node") === edges("a"))
        .select(col("b").as("node"), (col("d") + col("w")).as("d"))
      dist = dist.union(relax)
        .groupBy(col("node")).agg(min(col("d")).as("d"))
        .localCheckpoint()
    }
    dist
  }

  private val ssspSql =
    """WITH RECURSIVE half AS (
      |  SELECT DISTINCT x.l_partkey AS u, y.l_partkey AS v
      |  FROM lineitem x JOIN lineitem y
      |    ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
      |  WHERE x.l_partkey < 500 AND y.l_partkey < 500),
      |e AS (
      |  SELECT u AS a, v AS b, 1 + (u + v) % 3 AS w FROM half
      |  UNION ALL
      |  SELECT v, u, 1 + (u + v) % 3 FROM half),
      |seed AS (SELECT min(a) AS s FROM e),
      |reach(node, d, hops) AS (
      |  SELECT s, CAST(0 AS BIGINT), 0 FROM seed
      |  UNION
      |  SELECT e.b, r.d + e.w, r.hops + 1
      |  FROM reach r JOIN e ON e.a = r.node WHERE r.hops < 6)
      |SELECT node, min(d) AS d FROM reach GROUP BY node""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q260_sssp", sssp, Some(ssspSql)),
    QueryDef("q127_triangles", triangles, Some(trianglesSql)),
    QueryDef("q127b_clustering", clusteringCoeff, Some(clusteringCoeffSql)),
    QueryDef("q130_bfs_hops", bfsHops, Some(bfsHopsSql)),
    QueryDef("q140_pagerank", pageRank, Some(pageRankSql)))

  // ---- connected components: alternating large-star / small-star ----------

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC 2014) —
    * the O(log n)-round algorithm. Min-label propagation (q55's loop)
    * needs O(component diameter) rounds: fine when LSH keeps components
    * tiny, quadratic-wall-clock on a long chain — a 10M-node path
    * component needs 10M rounds. The star alternation contracts the graph
    * toward rooted stars with doubling speed, so ANY component shape
    * converges in a logarithmic number of rounds; each round is two
    * grouped aggregations and a join, all edge-keyed, nothing driver-side
    * but the fixed-point witness.
    *
    *  - large-star: every node attaches its LARGER neighbors to the
    *    minimum of its closed neighborhood;
    *  - small-star: every node attaches itself and its smaller neighbors
    *    to that minimum.
    *
    * Both emissions keep (bigger, smaller) orientation, so the edge set
    * stays canonical and the fixed point (every component a star rooted
    * at its minimum node) is detected by two-sided `except` emptiness —
    * edge-set-sized work, exact, no hash-collision risk. Returns
    * (node, label) for every node incident to an input pair; label is the
    * component's minimum node — identical to min-propagation's output, so
    * the q55 oracle grades both. */
  private[graft] def ccStarWithRounds(pairs: DataFrame,
      maxRounds: Int = 30): (DataFrame, Int) = {
    def bidir(e: DataFrame): DataFrame =
      e.union(e.select(col("b").as("a"), col("a").as("b")))
    def withMin(e: DataFrame): DataFrame = {
      val b = bidir(e)
      b.join(b.groupBy(col("a")).agg(min(col("b")).as("mb"))
          .select(col("a"), least(col("a"), col("mb")).as("m")), "a")
    }
    def largeStar(e: DataFrame): DataFrame =
      withMin(e).where(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b")).distinct()
    def smallStar(e: DataFrame): DataFrame = {
      val bm = withMin(e)
      bm.where(col("b") < col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .union(bm.select(col("a"), col("m").as("b")))
        .where(col("a") =!= col("b")).distinct()
    }
    var e = pairs.select(
        greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .where(col("a") =!= col("b")).distinct().localCheckpoint()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val e2 = smallStar(largeStar(e)).localCheckpoint()
      rounds += 1
      converged = e2.except(e).isEmpty && e.except(e2).isEmpty
      e = e2
    }
    require(converged,
      s"ccStar: no fixed point within $maxRounds rounds — defect, not scale")
    val labels = e.select(col("a").as("node"), col("b").as("label"))
      .union(e.select(col("b").as("node"), col("b").as("label")))
      .distinct()
    (labels, rounds)
  }

  private[graft] def ccStar(pairs: DataFrame): DataFrame =
    ccStarWithRounds(pairs)._1
}
