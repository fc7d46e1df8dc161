package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Ckpt, Knn}
import graft.llm.AnnSearch

/** Scale experiment for the round-13 `ann_graph_search` row: the
  * beam/hops recall-cost trade of graph-based ANN at generated scale.
  *
  * Claims under test:
  *  1. search cost is |Q|·beam·k rows per hop — independent of corpus
  *     size once the navigation graph exists — where brute force pays
  *     |Q|·N per batch;
  *  2. recall@3 vs the exact top-3 rises monotonically with beam and
  *     hops (the nprobe-style knob the declared row documents);
  *  3. the graph BUILD is the corpus-scale stage (bucketed Σ|b|² pairs,
  *     the embedding_knn_graph shape) and amortizes across query
  *     batches.
  *
  * usage: tools/run.sh graft.tools.GraphSearchProbe [nVecs] [nQ] [dim] [k]
  * Deterministic (hash-seeded vectors), no RNG state.
  */
object GraphSearchProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 100000
    val nQ = if (args.length > 1) args(1).toInt else 100
    val dim = if (args.length > 2) args(2).toInt else 16
    val k = if (args.length > 3) args(3).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.TopKAgg.tune(spark)

    def time[T](what: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[graphsearch] $what%-42s $w%7.2f s")
      (r, w)
    }

    // `clustered` = 5th arg: vectors as centroid(id % 256) + noise/5 —
    // the realistic embedding-corpus shape (real corpora cluster; the
    // uniform leg is the adversarial no-structure floor)
    val clustered = args.length > 4 && args(4) == "clustered"
    def vecs(lo: Long, hi: Long, idCol: String, vCol: String): DataFrame = {
      val base =
        if (clustered)
          s"CAST(pmod(hash(pmod(id, 256), i), 2000) - 1000 AS DOUBLE) / 1000.0 + " +
            s"CAST(pmod(hash(id, i, 99), 2000) - 1000 AS DOUBLE) / 5000.0"
        else "CAST(pmod(hash(id, i), 2000) - 1000 AS DOUBLE) / 1000.0"
      spark.range(lo, hi).select(col("id").as(idCol),
        expr(s"transform(sequence(0, ${dim - 1}), i -> $base)").as(vCol))
    }

    val q = vecs(0, nQ, "q_id", "q_v").persist()
    // pre-materialized (Ckpt.truncate) so graphSearchOf uses it as-is —
    // the persisted-index amortization the search-only walls measure
    val t = graft.core.Ckpt.truncate(vecs(nQ, nQ + n, "t_id", "t_v"))
    println(s"[graphsearch] n=$n nQ=$nQ dim=$dim k=$k cpus=$cpus")

    // exact baseline — |Q|·N pairs, the cost the graph search avoids
    val (brute, bruteWall) = time(s"brute top-3 (${nQ.toLong * n} pairs)") {
      Knn.knn(q.select(col("q_id").as("vec_id"), col("q_v").as("v")),
          t.select(col("t_id").as("vec_id"), col("t_v").as("v")),
          k = 3, dist = AnnSearch.cosineDist)
        .select(col("q_id"), col("t_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    // build once, search many — the production amortization (the graph
    // is the persisted index; per-batch cost is the search alone)
    val (edges, buildWall) = time(s"knn-graph build (k=$k, amortized)") {
      graft.core.Ckpt.truncate(AnnSearch.knnGraphOf(
        t.select(col("t_id").as("vec_id"), col("t_v").as("v")), k)
        .select(col("src"), col("dst")))
    }

    for ((beam, hops) <- Seq((4, 2), (4, 3), (8, 3), (16, 3), (16, 4))) {
      val (res, wall) = time(f"search beam=$beam%2d hops=$hops (prebuilt graph)") {
        AnnSearch.graphSearchOf(q, t, beam, hops, k, edges0 = Some(edges))
          .select(col("q_id"), col("t_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val recall = res.count(brute.contains).toDouble / brute.size
      println(f"[graphsearch]   -> recall@3 $recall%.3f  (build $buildWall%.2f s " +
        f"amortized; brute $bruteWall%.2f s per batch)")
    }

    // ---- append leg (round 14, VERDICT r13 #6): recall after N
    // appends WITHOUT rewire vs a full rebuild — the navigation graph
    // now has a persisted lifecycle (saveKnnGraph/appendToKnnGraph),
    // and this measures the decay that sets the rebuild cadence. Base
    // graph over 60% of the corpus, four 10%-batches appended; after
    // each append the search runs over the loaded (grown) graph and
    // recall is measured against brute over the CURRENT corpus.
    if (args.contains("append")) {
      val dir = java.nio.file.Files.createTempDirectory("knngraphprobe").toString
      val base = Ckpt.truncate(vecs(nQ, nQ + (n * 6L / 10), "vec_id", "v"))
      val (_, saveWall) = time(s"saveKnnGraph (60% base)") {
        AnnSearch.saveKnnGraph(base, dir, k)
      }
      def bruteOver(hi: Long): Set[(Long, Long)] =
        Knn.knn(q.select(col("q_id").as("vec_id"), col("q_v").as("v")),
            vecs(nQ, hi, "t_id", "t_v").select(col("t_id").as("vec_id"), col("t_v").as("v")),
            k = 3, dist = AnnSearch.cosineDist)
          .select(col("q_id"), col("t_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      def searchOver(hi: Long, tag: String): Unit = {
        val (_, edges) = AnnSearch.loadKnnGraph(spark, dir)
        val e = Ckpt.truncate(edges.select(col("src"), col("dst")))
        val tNow = Ckpt.truncate(vecs(nQ, hi, "t_id", "t_v"))
        val truth = bruteOver(hi)
        val res = AnnSearch.graphSearchOf(q, tNow, beam = 8, hops = 3, k, Some(e))
          .select(col("q_id"), col("t_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"[graphsearch] append-leg $tag%-22s corpus=${hi - nQ}%7d " +
          f"recall@3 ${res.count(truth.contains).toDouble / truth.size}%.3f")
        Ckpt.release(e)
        Ckpt.release(tNow)
      }
      searchOver(nQ + n * 6L / 10, "base (no appends)")
      (1 to 4).foreach { i =>
        val lo = nQ + n * (5L + i) / 10
        val hi = nQ + n * (6L + i) / 10
        val (_, w) = time(f"appendToKnnGraph batch $i (10%%)") {
          AnnSearch.appendToKnnGraph(spark,
            vecs(lo, hi, "vec_id", "v"), dir, k, checkIds = false)
        }
        searchOver(hi, s"after append $i")
      }
      // maintenance trigger on the drifted graph (round 15, VERDICT r14
      // missing #2): the sampled adjacency-recall observable must fire
      // the rebuild after four no-rewire appends and restore it — the
      // probe leg behind RunAnn.maintainGraph's floor default. The graph
      // lives at <out>/graph for the runner's path convention.
      val mroot = java.nio.file.Files.createTempDirectory("knngraphmaint").toString
      val mdir = s"$mroot/graph"
      var mwall = 0.0
      AnnSearch.saveKnnGraph(base, mdir, k)
      (1 to 4).foreach { i =>
        val lo = nQ + n * (5L + i) / 10
        val hi = nQ + n * (6L + i) / 10
        AnnSearch.appendToKnnGraph(spark, vecs(lo, hi, "vec_id", "v"), mdir, k,
          checkIds = false)
      }
      // two floors: the default 0.8 (healthy after 4 appends — measures,
      // declines) and a tight 0.95 (fires — rebuild restores exactness)
      for (floor <- Seq(0.8, 0.95)) {
        val (mreport, mwall2) = time(f"maintainGraph (4 appends, floor $floor)") {
          graft.run.RunAnn.maintainGraph(spark, mroot, minRecall = floor, k = k)
        }
        println(mreport.linesIterator.filter(l =>
          l.startsWith("adjacency_recall") || l.startsWith("rebuilt"))
          .map("[graphsearch]   " + _).mkString("\n"))
        if (floor == 0.8) mwall = mwall2
      }
      // retraction leg (round 15): tombstone a hash-stride ~10 % of the
      // graph (takedown), compact, and let the SAME adjacency-recall
      // observable price the damage — surviving nodes whose stored
      // top-k referenced retracted neighbors lost those out-edges
      val (_, rWall) = time("retract ~10% + compact") {
        val ids = spark.read.parquet(s"$mdir/nodes")
          .filter(org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.xxhash64(col("vec_id")),
            org.apache.spark.sql.functions.lit(10)) === 0)
          .select(col("vec_id"))
        AnnSearch.removeFromKnnGraph(ids, mdir)
        AnnSearch.compactKnnGraph(spark, mdir)
      }
      val (mreport2, _) = time("maintainGraph (post-takedown, floor 0.95)") {
        graft.run.RunAnn.maintainGraph(spark, mroot, minRecall = 0.95, k = k)
      }
      println(mreport2.linesIterator.filter(l =>
        l.startsWith("adjacency_recall") || l.startsWith("rebuilt"))
        .map("[graphsearch]   " + _).mkString("\n"))
      println(f"[graphsearch] retract leg wall $rWall%.2f s")
      // the comparison ceiling: one full rebuild over the same final corpus
      val (_, rebuildWall) = time("full rebuild (100%)") {
        AnnSearch.saveKnnGraph(Ckpt.truncate(vecs(nQ, nQ + n, "vec_id", "v")), dir, k)
      }
      searchOver(nQ + n, "full rebuild")
      println(f"[graphsearch] append-leg walls: base-save $saveWall%.2f s, " +
        f"rebuild $rebuildWall%.2f s, maintain (measure+rebuild+re-measure) $mwall%.2f s")
    }
    spark.stop()
  }
}
