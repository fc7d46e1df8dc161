package graft

import org.apache.spark.sql.functions._

import graft.core.Ckpt
import graft.rel.Graph

/** Round-16 optimization pins: the shared edge-list memo must be
  * value-invisible (every consumer reads the same rows the per-query
  * builds produced), and adopters must never release a frame they did
  * not truncate — releasing the memo would hand the NEXT consumer a
  * dead checkpoint (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND mid-bench).
  */
class EdgeMemoSpec extends SparkSpecBase {

  test("shared edge lists are value-identical to the per-query builds") {
    assert(collectSet(Graph.custSuppEdgesShared(spark, sfDir)) ===
      collectSet(Graph.custSuppEdges(spark, sfDir)))
    assert(collectSet(Graph.coOrderEdgesShared(spark, sfDir)) ===
      collectSet(Graph.coOrderEdges(spark, sfDir)))
  }

  test("memo survives adopter operators (owners-release contract)") {
    val memo = Graph.custSuppEdgesShared(spark, sfDir)
    // three adopters that historically released their edge frame
    Graph.pageRank(memo, iters = 1).count()
    graft.SparkEntry.queries("graph_bfs")(spark, sfDir).count()
    graft.SparkEntry.queries("graph_harmonic")(spark, sfDir).count()
    graft.SparkEntry.queries("graph_betweenness")(spark, sfDir).count()
    graft.SparkEntry.queries("graph_kcore")(spark, sfDir).count()
    graft.SparkEntry.queries("graph_kcore_fixpoint")(spark, sfDir).count()
    // the memo's checkpoint blocks must still be readable
    assert(memo.count() === Graph.custSuppEdges(spark, sfDir).count())
    // and it is the SAME frame the map still serves
    assert(Graph.custSuppEdgesShared(spark, sfDir) eq memo)
  }

  test("hits/bipartite_proj memo-derived inputs equal the original builders") {
    // hits half = even-src slice of the symmetrized memo
    val fromMemo = Graph.custSuppEdgesShared(spark, sfDir)
      .filter(col("src") % 2 === 0)
    val original = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    assert(collectSet(fromMemo) === collectSet(original))
    assert(fromMemo.schema === original.schema)
    // bipartite membership = decoded half (shiftright keeps the key type)
    val memb = Graph.custSuppEdgesShared(spark, sfDir)
      .filter(col("src") % 2 === 0)
      .select(shiftright(col("src"), 1).as("ok"),
        shiftright(col("dst") - 1, 1).as("pk"))
    val membOrig = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("ok"), col("l_suppkey").as("pk"))
      .distinct()
    assert(collectSet(memb) === collectSet(membOrig.distinct()))
    assert(memb.schema === membOrig.schema)
  }

  test("releaseSharedEdges rebuilds on next call") {
    val before = Graph.custSuppEdgesShared(spark, sfDir)
    Graph.releaseSharedEdges()
    val after = Graph.custSuppEdgesShared(spark, sfDir)
    assert(!(after eq before))
    assert(after.count() > 0)
  }
}
