package graft

import org.apache.spark.sql.functions._

import graft.rel.Graph

class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  test("pageRank conserves mass and respects symmetry") {
    // undirected triangle + pendant: a-b, b-c, c-a, c-d (symmetrized)
    val half = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val edges = half.unionAll(half.select($"dst".as("src"), $"src".as("dst")))
    val r = Graph.pageRank(edges, iters = 10).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-4)         // rank mass conserved
    assert(r(1) === r(2))                               // a,b symmetric
    assert(r(3) > r(1) && r(4) < r(1))                  // hub up, pendant down
  }

  test("pageRank on the harness graph: positive ranks, one row per node") {
    val edges = Graph.custSuppEdges(spark, sfDir)
    val pr = Graph.pageRank(edges, iters = 3)
    val nNodes = edges.select("src").distinct().count()
    assert(pr.count() === nNodes)
    assert(pr.filter(col("rank") <= 0).count() === 0)
  }
}
