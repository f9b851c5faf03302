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
}
