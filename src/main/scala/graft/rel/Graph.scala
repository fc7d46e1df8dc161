package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.rel.Queries.rnd

/** Graph analytics over relationally-derived edge lists. The reference
  * lineage has no graph operators [LINEAGE §2.10]; this is north-star
  * EXT surface like `Dedup.connectedComponents` (the other graph op in
  * the library), here on the customer↔supplier transaction graph.
  *
  * Scale shape: each PageRank iteration is one equi-join (ranks ⋈
  * edges on src) + one keyed sum — the standard message-passing round,
  * all shuffles on the same edge key so a pre-partitioned/bucketed
  * edge table reuses its exchange. A FIXED iteration count keeps the
  * operator oracle-expressible (the DuckDB twin unrolls the same three
  * rounds as CTEs) and the lineage bounded — for open-ended iteration
  * reuse the `localCheckpoint`-per-round pattern of
  * `Dedup.connectedComponents` (Dedup.scala:249).
  */
object Graph {

  private val Damping = 0.85

  /** Undirected customer↔supplier edges from co-occurrence in an order:
    * distinct (customer, supplier) pairs through orders ⋈ lineitem,
    * namespaced into one node-id space (customers even, suppliers odd).
    */
  def custSuppEdges(s: SparkSession, d: String): DataFrame = {
    val half = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    half.unionAll(half.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** PageRank with `iters` synchronous rounds at damping 0.85, uniform
    * init. Every node has out-degree ≥ 1 (edges are symmetrized), so
    * there is no dangling mass. Node count enters the plan as a
    * broadcast one-row aggregate, not a driver-side collect.
    *
    * Iterative-lineage hygiene (same lesson as
    * `Dedup.connectedComponents`): the per-round frames are
    * `localCheckpoint`ed so each round plans against a constant-size
    * tree and downstream actions never re-derive earlier rounds —
    * WITHOUT this, a 349-node / 3-round run spent 6.3 s in repeated
    * analysis/planning of the unrolled lineage (CcProbe pr leg); with
    * it, 2.2 s. On a cluster this would be `checkpoint()` to reliable
    * storage. Checkpointing changes no values, so the DuckDB oracle's
    * unrolled CTEs still match.
    */
  def pageRank(edgesIn: DataFrame, iters: Int = 3): DataFrame = {
    // edges are read iters + 2 times (nodes, degrees, every round's
    // join) — materialize the derivation once instead of re-running it
    val edges = edgesIn.localCheckpoint()
    val nodes = edges.select(col("src").as("node")).distinct().localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("od")).localCheckpoint()
    val n1 = broadcast(nodes.agg(count(lit(1)).cast("double").as("n")))
    var ranks = nodes.crossJoin(n1).select(col("node"), (lit(1.0) / col("n")).as("r"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks, edges("src") === ranks("node"))
        .join(deg, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("r") / col("od")).as("c"))
      // decimal-string complement (same discipline as ewmaHourly): the
      // Scala expression 1 - 0.85 is 0.15000000000000002, one ulp off
      // the 0.15 the oracle's 0.15e0 literal parses to — derive the
      // teleport factor through BigDecimal text so both engines run the
      // identical double
      val teleport = (BigDecimal(1) - BigDecimal(Damping.toString)).toDouble
      ranks = nodes.crossJoin(n1)
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) / col("n") + lit(Damping) * coalesce(col("c"), lit(0.0))).as("r"))
        .localCheckpoint()
    }
    ranks.select(col("node"), rnd(col("r"), 6).as("rank"))
  }

  def pageRankQuery(s: SparkSession, d: String): DataFrame =
    pageRank(custSuppEdges(s, d), iters = 3)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> pageRankQuery,
  )

  val rawOracles: Map[String, String] = Map(
    "graph_pagerank" -> {
      // the same three message-passing rounds, unrolled as CTEs
      def round(i: Int): String =
        s"c$i AS (SELECT e.dst AS node, sum(r${i - 1}.r / deg.od) AS c " +
          s"FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node " +
          "JOIN deg ON e.src = deg.src GROUP BY 1), " +
          s"r$i AS (SELECT v.node, 0.15e0 / nn.n + 0.85e0 * coalesce(c$i.c, 0e0) AS r " +
          s"FROM v CROSS JOIN nn LEFT JOIN c$i ON v.node = c$i.node), "
      "WITH eraw AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst " +
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
        "e AS (SELECT src, dst FROM eraw UNION ALL SELECT dst, src FROM eraw), " +
        "v AS (SELECT DISTINCT src AS node FROM e), " +
        "deg AS (SELECT src, count(*) AS od FROM e GROUP BY 1), " +
        "nn AS (SELECT count(*)::DOUBLE AS n FROM v), " +
        "r0 AS (SELECT node, 1e0 / nn.n AS r FROM v CROSS JOIN nn), " +
        round(1) + round(2) +
        "c3 AS (SELECT e.dst AS node, sum(r2.r / deg.od) AS c " +
        "FROM e JOIN r2 ON e.src = r2.node JOIN deg ON e.src = deg.src GROUP BY 1), " +
        "r3 AS (SELECT v.node, 0.15e0 / nn.n + 0.85e0 * coalesce(c3.c, 0e0) AS r " +
        "FROM v CROSS JOIN nn LEFT JOIN c3 ON v.node = c3.node) " +
        "SELECT node, rnd(r, 6) AS rank FROM r3"
    },
  )
}
