package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A/B the `Ckpt.scoped` eager-fold cost per regressed row (round 15,
  * VERDICT r14 wrong #1): times each builder (a) RAW — lazy construction
  * + `.count()`, the pre-r14 shape, vs (b) SCOPED — `Ckpt.scoped{...}`
  * + `.count()`, the r14 registration shape. The delta isolates what the
  * wrap itself costs (eager output truncation + buf release) from the
  * builder's own work, so the unwrap/no-op decision is measured, not
  * guessed. Dev utility only.
  *
  * usage: tools/run.sh graft.tools.ScopedProbe [sfdir] [reps]
  */
object ScopedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.functions.TopKAgg.FallbackConfKey,
        graft.functions.TopKAgg.FallbackThreshold.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // batch 1 = the r14-regressed rows (audited round 15, unwrapped);
    // batch 2 = the still-wrapped rows whose builders END in a lazy
    // derivation over internal checkpoints — the remaining candidates
    // for the eager-fold tax (pass row names as args to restrict)
    val all: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "stats_fdr_bh" -> graft.rel.Queries.statsFdrBh _,
      "stats_kruskal" -> graft.rel.Queries.statsKruskal _,
      "stats_spearman" -> graft.rel.Queries.statsSpearman _,
      "stats_mannwhitney" -> graft.rel.Queries.statsMannwhitney _,
      "dedup_substring" -> graft.llm.Dedup.substringDup _,
      "dedup_substring_50" -> graft.llm.Dedup.substringDup50 _,
      "graph_clustering" -> graft.rel.Graph.clusteringQuery _,
      "graph_cc_fixpoint" -> graft.rel.Graph.ccFixpointQuery _,
      "events_rfm" -> graft.rel.TimeSeries.rfm _,
      "events_power_users" -> graft.rel.TimeSeries.powerUsers _,
      "corpus_line_dedup" -> graft.llm.Curation.lineDedup _,
      "text_rake" -> graft.llm.TextAnalysis.rake _,
      "tokenizer_encode" -> graft.llm.TextAnalysis.bpeEncode _,
      "tokenizer_fertility" -> graft.llm.TextAnalysis.bpeFertility _,
      "quality_perplexity" -> graft.llm.TextAnalysis.perplexityProxy _,
      "embedding_outliers" -> graft.llm.AnnSearch.embeddingOutliers _,
      "graph_link_pred" -> graft.rel.Graph.linkPredQuery _,
      "graph_assortativity" -> graft.rel.Graph.assortativityQuery _,
      "graph_modularity" -> graft.rel.Graph.modularityQuery _,
      "ts_theil_sen_sampled" -> graft.rel.TimeSeries.theilSenSampledQuery _)
    val want = if (args.length > 2) args.drop(2).toSet else Set.empty[String]
    val rows = if (want.isEmpty) all else all.filter(r => want(r._1))
    // warmup both shapes at sf0.001 (codegen/JIT untimed)
    rows.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => }
      try graft.core.Ckpt.scoped(fn(spark, "/root/testdata/sf0.001")).count()
      catch { case _: Throwable => }
    }
    spark.catalog.clearCache()
    System.gc()
    println("[scoped-probe] warmup done")
    rows.foreach { case (name, fn) =>
      def time(label: String, run: () => Long): Unit = {
        val walls = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          run()
          val w = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          System.gc()
          w
        }
        println(f"[scoped-probe] $name%-20s $label%-7s " +
          f"min=${walls.min}%.2f s samples=${walls.map(w => f"$w%.2f").mkString(",")}")
      }
      time("raw", () => fn(spark, sfDir).count())
      time("scoped", () => graft.core.Ckpt.scoped(fn(spark, sfDir)).count())
      // mechanism isolation: collect = full materialization through the
      // NORMAL action path (AQE fully applied); lckpt = full
      // materialization through the toRdd path truncate() uses. If
      // collect ~ raw but lckpt ~ scoped, the cost is the execution
      // path, not the materialized width.
      time("collect", () => fn(spark, sfDir).collect().length.toLong)
      time("lckpt", () => {
        val out = fn(spark, sfDir).localCheckpoint()
        val n = out.count()
        graft.core.Ckpt.release(out)
        n
      })
    }
    spark.stop()
  }
}
