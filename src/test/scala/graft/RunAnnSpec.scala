package graft

import org.apache.spark.sql.functions._

import graft.run.RunAnn

/** End-to-end spec for the ANN index runner: the persisted-index search
  * must be bit-identical to the inline IVF path over the same
  * centroids (the round-9 index pin, exercised through the runner),
  * recall must clear the family's floor, and the report must reconcile
  * with the artifacts on disk.
  */
class RunAnnSpec extends SparkSpecBase {

  test("RunAnn end-to-end on sf0.001: indexed ≡ inline, recall floor, reconciled report") {
    val out = java.nio.file.Files.createTempDirectory("ann").toString
    val report = RunAnn.run(spark, sfDir, out, k = 5, nprobe = 2)
    val kv = report.linesIterator.flatMap(_.split(": ", 2) match {
      case Array(a, b) => Some(a -> b); case _ => None
    }).toMap

    // artifacts exist and reconcile with the report
    val results = spark.read.parquet(s"$out/results")
    val stageLines = report.linesIterator.filter(_.startsWith("  "))
      .map { l => val p = l.trim.split(" "); p(0) -> p(1).toLong }.toMap
    assert(stageLines("search_indexed") === results.count())
    assert(results.select("q_id").distinct().count() === kv("n_queries").toLong)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/report.txt")) === report)

    // the persisted-index search ≡ the inline path over the SAME
    // centroids (load them back rather than re-training)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), graft.core.Distance.asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val t = e.filter(col("vec_id") % 10 =!= 0)
      .select(col("vec_id").as("t_id"), col("v").as("t_v"))
    val cent = spark.read.parquet(s"$out/index/centroids")
    val inline = graft.llm.AnnSearch.ivfSearch(q, t, cent, k = 5, nprobe = 2)
    assert(collectSet(results) === collectSet(inline),
      "indexed search must be bit-identical to the inline IVF path")

    // recall floor (the AnnSearchSpec IVF discipline)
    val recall = kv.collectFirst { case (k2, v) if k2.startsWith("recall_at_") => v }
      .get.split(" ").head.toDouble
    assert(recall >= 0.4, s"recall $recall below floor")
  }

  test("RunAnn.runGraph: persisted graph + search artifacts reconcile; maintain and retract compose on its output") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("rungraph").toString
    val report = RunAnn.runGraph(spark, sfDir, out, k = 3, beam = 8, hops = 3)
    val stageLines = report.linesIterator
      .filter(_.matches("""  \S+ \d+ .*"""))
      .map { l => val p = l.trim.split(" "); p(0) -> p(1).toLong }.toMap
    // artifacts reconcile with the report
    assert(stageLines("build_graph") ===
      spark.read.parquet(s"$out/graph/edges").count())
    val results = spark.read.parquet(s"$out/graph_results")
    assert(stageLines("search_graph") === results.count())
    assert(results.columns.toSet.intersect(Set("q_id", "t_id")) === Set("q_id", "t_id"))
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/graph_run_report.txt")) === report)
    // the graph lands where the lifecycle machinery manages it: the
    // maintenance trigger measures a fresh build at exact adjacency
    // (rebuilt: false at any floor <= 1), and a takedown through
    // retractIds composes against the same directory
    val m = RunAnn.maintainGraph(spark, out, minRecall = 0.99, k = 3)
    assert(m.contains("rebuilt: false"), m)
    val someId = spark.read.parquet(s"$out/graph/nodes")
      .select("vec_id").as[Long].head()
    graft.llm.AnnSearch.removeFromKnnGraph(Seq(someId).toDF("vec_id"), s"$out/graph")
    val (nodesAfter, _) = graft.llm.AnnSearch.loadKnnGraph(spark, s"$out/graph")
    assert(!nodesAfter.select("vec_id").as[Long].collect().contains(someId))
  }

  test("RunAnn.maintain: drifted appends cross the balance threshold, retrain restores it, no vector lost") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("annmaint").toString
    // pre-drift corpus: 40 vectors on a line, 4 well-placed centroids
    // → 10 per cell, ratio 1.0
    val base = (0 until 40).map(i => (i.toLong, Seq(i.toDouble, 0.0))).toDF("t_id", "t_v")
    val cent = Seq(5.0, 15.0, 25.0, 35.0).zipWithIndex
      .map { case (x, i) => (i.toLong, Seq(x, 0.0)) }.toDF("c_id", "c_v")
    graft.llm.AnnSearch.saveIvfIndex(base, cent, s"$out/index")

    // drift: 40 appended vectors far to the right all land in the last
    // centroid's cell → sizes [10,10,10,50], max/median 5.0
    val drift = (0 until 40).map(i => (100L + i, Seq(100.0 + i, 0.0))).toDF("t_id", "t_v")
    graft.llm.AnnSearch.appendToIvfIndex(spark, drift, s"$out/index")
    def balance(): Double = {
      val sizes = spark.read.parquet(s"$out/index/cells")
        .groupBy("cell").agg(count(lit(1)).as("n"))
      val r = sizes.agg(max(col("n")).as("mx"),
        expr("percentile(n, 0.5)").as("med")).head()
      r.getLong(0) / r.getDouble(1)
    }
    val before = balance()
    assert(before > 4.0, s"drift must imbalance the cells (got $before)")

    // below threshold: measurement only, nothing rewritten
    val noop = RunAnn.maintain(spark, out, maxRatio = before + 1)
    assert(noop.contains("retrained: false"), noop)
    assert(balance() === before)

    // above threshold: warm-start retrain restores balance; every
    // vector survives the rebuild
    val report = RunAnn.maintain(spark, out, maxRatio = 4.0)
    assert(report.contains("retrained: ratio"), report)
    val after = balance()
    assert(after < 4.0 && after < before,
      s"retrain must restore balance below the threshold: $before -> $after")
    val ids = spark.read.parquet(s"$out/index/cells")
      .select("t_id").as[Long].collect().toSet
    assert(ids.size === 80 && ids === ((0 until 40).map(_.toLong).toSet ++
      (0 until 40).map(100L + _).toSet),
      "the rebuild must preserve every stored vector")
  }

  test("RunAnn.maintainGraph: append drift crosses the recall floor, rebuild restores adjacency") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graphmaint").toString
    // 2-effective-dim unit vectors at angle θ (6 zero pads keep one
    // sign-LSH bucket): cosine distance is monotone in |Δθ|, so the
    // true adjacency is exactly the angle ordering
    def vec(theta: Double): Seq[Double] =
      Seq(math.cos(theta), math.sin(theta), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    // base nodes 0..4 spread 0.3 rad apart; k = 2 graph = angle-adjacent
    val base = (0 until 5).map(i => (i.toLong, vec(i * 0.3))).toDF("vec_id", "v")
    graft.llm.AnnSearch.saveKnnGraph(base, s"$out/graph", k = 2)

    // drift: a TIGHT cluster of four new vectors near node 0 (θ ≈ 0.05,
    // Δθ ≈ 0.005 within the cluster) — each new node's top-2 is other
    // NEW nodes, so no reverse link reaches the stored nodes, while
    // node 0's (and node 1's) TRUE top-2 is now the cluster: the
    // no-rewire staleness the maintenance trigger exists to catch
    val drift = (0 until 4).map(i => (100L + i, vec(0.05 + i * 0.005)))
      .toDF("vec_id", "v")
    graft.llm.AnnSearch.appendToKnnGraph(spark, drift, s"$out/graph", k = 2)

    def recallNow(): Double = {
      val (nodes, edges) = graft.llm.AnnSearch.loadKnnGraph(spark, s"$out/graph")
      val truth = graft.llm.AnnSearch.knnTruthOf(nodes, nodes, 2)
      truth.join(edges.select(col("src"), col("dst")),
        Seq("src", "dst"), "left_semi").count().toDouble / truth.count()
    }
    val before = recallNow()
    assert(before < 0.8, s"append drift must degrade adjacency recall (got $before)")

    // below the floor parameter: measurement only, nothing rewritten
    val edgesBefore = spark.read.parquet(s"$out/graph/edges").count()
    val noop = RunAnn.maintainGraph(spark, out, minRecall = before - 0.05,
      k = 2, sampleMod = 1)
    assert(noop.contains("rebuilt: false"), noop)
    assert(spark.read.parquet(s"$out/graph/edges").count() === edgesBefore)

    // above the floor: rebuild re-ranks every stored list; adjacency is
    // exact again and every node survives
    val report = RunAnn.maintainGraph(spark, out, minRecall = 0.9,
      k = 2, sampleMod = 1)
    assert(report.contains("rebuilt: recall"), report)
    val after = recallNow()
    assert(after === 1.0, s"rebuild must restore exact adjacency: $before -> $after")
    val ids = spark.read.parquet(s"$out/graph/nodes")
      .select("vec_id").as[Long].collect().toSet
    assert(ids === ((0 until 5).map(_.toLong).toSet ++ (0 until 4).map(100L + _).toSet),
      "the rebuild must preserve every node")
  }

  test("kNN-graph retraction: tombstones hide node+edges, appends avoid retracted nodes, compaction forgets, runner wires it") {
    import spark.implicits._
    import graft.llm.AnnSearch
    val out = java.nio.file.Files.createTempDirectory("graphretract").toString
    def vec(theta: Double): Seq[Double] =
      Seq(math.cos(theta), math.sin(theta), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val base = (0 until 5).map(i => (i.toLong, vec(i * 0.3))).toDF("vec_id", "v")
    AnnSearch.saveKnnGraph(base, s"$out/graph", k = 2)

    // tombstone node 2: the live view loses the node AND every edge
    // touching it, while the physical files still hold both
    AnnSearch.removeFromKnnGraph(Seq(2L).toDF("vec_id"), s"$out/graph")
    val (nodes, edges) = AnnSearch.loadKnnGraph(spark, s"$out/graph")
    assert(!nodes.select("vec_id").as[Long].collect().contains(2L))
    val liveEdges = edges.select("src", "dst").as[(Long, Long)].collect()
    assert(liveEdges.nonEmpty && !liveEdges.exists(e => e._1 == 2L || e._2 == 2L),
      s"live edges must not touch the tombstoned node: ${liveEdges.mkString(",")}")
    assert(spark.read.parquet(s"$out/graph/nodes")
      .select("vec_id").as[Long].collect().contains(2L),
      "tombstoning must not rewrite the physical table")

    // an append near the retracted node's position must select LIVE
    // neighbors only — never an edge into the tombstoned node
    AnnSearch.appendToKnnGraph(spark, Seq((50L, vec(0.61))).toDF("vec_id", "v"),
      s"$out/graph", k = 2)
    val newEdges = spark.read.parquet(s"$out/graph/edges")
      .filter(col("src") === 50L || col("dst") === 50L)
      .select("src", "dst").as[(Long, Long)].collect()
    assert(newEdges.nonEmpty && !newEdges.exists(e => e._1 == 2L || e._2 == 2L),
      s"append linked to a retracted node: ${newEdges.mkString(",")}")

    // compaction applies the tombstones physically and clears them
    AnnSearch.compactKnnGraph(spark, s"$out/graph")
    assert(!spark.read.parquet(s"$out/graph/nodes")
      .select("vec_id").as[Long].collect().contains(2L))
    assert(spark.read.parquet(s"$out/graph/edges")
      .filter(col("src") === 2L || col("dst") === 2L).count() === 0)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$out/graph/tombstones")))

    // runner wiring: a vec_id takedown through retractIds hits the
    // graph beside the IVF index (same id domain)
    val t = Seq((0L, vec(0.0)), (1L, vec(0.3)), (50L, vec(0.61))).toDF("t_id", "t_v")
    val cent = Seq((0L, vec(0.0))).toDF("c_id", "c_v")
    AnnSearch.saveIvfIndex(t, cent, s"$out/ivf")
    val report = graft.run.RunIngest.retractIds(spark, out,
      Seq(50L).toDF("vec_id"), "spec takedown")
    assert(report.contains("graph_nodes_retracted: 1"), report)
    assert(!spark.read.parquet(s"$out/graph/nodes")
      .select("vec_id").as[Long].collect().contains(50L),
      "the runner takedown must remove the graph node")
  }
}
