package graft

import java.nio.file.Files
import graft.queries.Graph
import org.scalatest.funsuite.AnyFunSuite

/** Graph family on closed-form inputs: a complete graph pins triangle
  * counts / clustering coefficients / BFS distances against combinatorics,
  * and an edgeless corpus (single-part orders) must yield empty results,
  * not a crash — the degenerate shape every real corpus contains slices
  * of. */
class GraphSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Stage a minimal lineitem.parquet of (order, part) rows. */
  private def stage(rows: Seq[(Long, Long)]): String = {
    val d = Files.createTempDirectory("graphspec")
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d.toString
  }

  test("complete graph K5: triangles, clustering coeff, and BFS are closed-form") {
    // one order containing parts {0,1,2,3,500} -> K5
    val dir = stage(Seq(0L, 1L, 2L, 3L, 500L).map(p => (1L, p)))
    val tri = Graph.triangles(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each K5 node sits in C(4,2) = 6 triangles
    assert(tri == Map(0L -> 6L, 1L -> 6L, 2L -> 6L, 3L -> 6L, 500L -> 6L), tri)
    val cc = Graph.clusteringCoeff(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    // all neighbor pairs connected: 2*6*1e6/(4*3) = exactly 1e6 ppm
    assert(cc.values.toSet == Set(1000000L), cc)
    val dist = Graph.bfsHops(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // seeds (node % 500 == 0): 0 and 500 at distance 0, the rest 1 hop
    assert(dist == Map(0L -> 0L, 500L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L),
      dist)
  }

  test("edgeless corpus (single-part orders) yields empty results, no crash") {
    val dir = stage(Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    assert(Graph.triangles(spark, dir).count() == 0)
    assert(Graph.clusteringCoeff(spark, dir).count() == 0)
    assert(Graph.bfsHops(spark, dir).count() == 0)
  }

  test("a path graph has no triangles but full BFS coverage from its seed") {
    // orders {0-1},{1-2},{2-3}: path 0-1-2-3; seed = node 0
    val dir = stage(Seq((1L, 0L), (1L, 1L), (2L, 1L), (2L, 2L),
      (3L, 2L), (3L, 3L)))
    assert(Graph.triangles(spark, dir).count() == 0)
    val cc = Graph.clusteringCoeff(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // interior nodes have degree 2, zero triangles -> cc 0 (and they DO
    // appear, which the q127-only output could not show)
    assert(cc.toSet == Set((1L, 0L, 0L), (2L, 0L, 0L)), cc.toSet)
    val dist = Graph.bfsHops(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L), dist)
  }

  /** The size gate's two physical strategies must enumerate the SAME
    * triple set — the scale contract: whichever side of the broadcast
    * budget a graph lands on, the answer is identical. Exercised on an
    * irregular multi-order graph (overlapping cliques + a pendant path)
    * where a single-once-per-triangle bug in either path would show. */
  test("broadcast and wedge-join triangle paths agree, and auto gates on size") {
    val dir = stage(
      Seq(1L, 2L, 3L, 4L).map(p => (1L, p)) ++    // K4 on {1,2,3,4}
      Seq(3L, 4L, 5L, 6L).map(p => (2L, p)) ++    // K4 on {3,4,5,6}
      Seq((3L, 6L), (3L, 7L), (4L, 7L), (4L, 8L)) // pendant path 6-7-8
    )
    def run(impl: String): Map[Long, Long] = {
      spark.conf.set("graft.graph.triangleImpl", impl)
      try Graph.triangles(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally spark.conf.unset("graft.graph.triangleImpl")
    }
    val viaBroadcast = run("broadcast")
    val viaWedge = run("wedge")
    assert(viaBroadcast == viaWedge, s"$viaBroadcast vs $viaWedge")
    assert(viaBroadcast.nonEmpty && viaBroadcast.values.sum % 3 == 0,
      viaBroadcast) // node-incidences triple-count each triangle
    // auto must take the wedge path when the budget excludes the
    // adjacency table (1-byte budget) and still return the same counts
    spark.conf.set("graft.graph.adjacencyBroadcastBytes", "1")
    try assert(run("auto") == viaBroadcast)
    finally spark.conf.unset("graft.graph.adjacencyBroadcastBytes")
    // ...and the broadcast path under the default budget
    assert(run("auto") == viaBroadcast)
    // suffixed budgets parse ("128m"); typo'd impl values fail loudly
    spark.conf.set("graft.graph.adjacencyBroadcastBytes", "128m")
    try assert(run("auto") == viaBroadcast)
    finally spark.conf.unset("graft.graph.adjacencyBroadcastBytes")
    val badImpl = intercept[IllegalArgumentException] { run("braodcast") }
    assert(badImpl.getMessage.contains("triangleImpl"), badImpl.getMessage)
    spark.conf.set("graft.graph.adjacencyBroadcastBytes", "lots")
    try {
      val badBudget = intercept[IllegalArgumentException] { run("auto") }
      assert(badBudget.getMessage.contains("adjacencyBroadcastBytes"),
        badBudget.getMessage)
    } finally spark.conf.unset("graft.graph.adjacencyBroadcastBytes")
  }

  test("q140 broadcast and shuffled-hash rank-join paths agree") {
    // the rank join is size-gated like q127's adjacency: a 1-byte budget
    // forces the shuffled-hash (Pregel co-partitioned) branch, which must
    // produce the identical exact-integer ranks as the broadcast branch
    val dir = stage(
      Seq(1L, 2L, 3L, 4L).map(p => (1L, p)) ++
      Seq(3L, 4L, 5L, 6L).map(p => (2L, p)) ++
      Seq((3L, 7L), (4L, 8L)))
    def ranks(): Map[Long, Long] = Graph.pageRank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaBroadcast = ranks()
    spark.conf.set("graft.graph.adjacencyBroadcastBytes", "1")
    val viaShj = try ranks()
      finally spark.conf.unset("graft.graph.adjacencyBroadcastBytes")
    assert(viaBroadcast == viaShj, s"$viaBroadcast vs $viaShj")
    assert(viaBroadcast.nonEmpty)
  }

  test("ccStar: logarithmic rounds on a path; components match union-find") {
    import org.apache.spark.sql.functions.col
    // 256-node path 0-1-2-...-255: diameter 255. Min-label propagation
    // needs 255 rounds; the star alternation must finish in O(log n).
    val chain = (0L until 255L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Graph.ccStarWithRounds(chain)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 256 && got.forall(_._2 == 0L), got.take(5).toSeq)
    assert(rounds <= 12, s"star alternation took $rounds rounds on a path")

    // deterministic pseudo-random graph vs a reference union-find
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
    val parent = Array.tabulate(200)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(n => n -> {
        // canonical min of the component: walk every member
        val root = find(n.toInt)
        (0 until 200).filter(m => find(m) == root)
          .filter(m => edges.exists { case (x, y) => x == m || y == m })
          .min.toLong
      }).toMap
    val starGot = Graph.ccStar(edges.toDF("a", "b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(starGot == expected,
      s"diff: ${starGot.toSet.diff(expected.toSet).take(5)}")
  }
}
