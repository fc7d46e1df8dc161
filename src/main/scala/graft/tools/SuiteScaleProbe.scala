package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composite scale sweep (round 10, VERDICT r9 #4): ONE run that scales
  * the whole harness data directory ~K× past sf0.1 and executes the
  * top-10 most expensive bench rows end-to-end against it — converting
  * "each piece scales" (the per-operator probes) into "the suite
  * scales". Records wall, rows out, total shuffle-write bytes, and max
  * per-stage peak execution memory per leg (a SparkListener sum/max over
  * the leg's stages); results land in SCALE.md's round-10 table.
  *
  * usage: tools/run.sh graft.tools.SuiteScaleProbe [K=10] [baseDir=/root/testdata/sf0.1]
  *
  * Scaling is REPLICA-BASED — the TPC-H discipline: K copies of each
  * table with every table-local key shifted by replica × (max key + 1),
  * foreign keys shifted by the REFERENCED table's offset, so per-key
  * densities, join selectivities, and group cardinalities per replica
  * are exactly the base table's (a naive row duplication would instead
  * multiply per-key density and measure skew, not scale). Fixed
  * dimensions (nation/region) stay fixed, as TPC-H keeps them. Per
  * modality:
  *  - events: replicas shift TIME by one year each — K× longer history,
  *    same hourly density (the calendar axis a time-series suite scales
  *    along); user_id shifts so the population grows K×.
  *  - documents: every TOKEN is namespaced `r<i>_<tok>` per replica —
  *    within-replica token-set structure (and thus the planted near-dup
  *    rate) is EXACTLY the base corpus's, while cross-replica Jaccard is
  *    0 (un-namespaced copies would be J ≈ 0.97 cross-replica near-dups,
  *    quadratically inflating true pairs — measuring an artifact).
  *  - embeddings: component-wise +i·0.001 nudge per replica keeps
  *    vectors distinct without moving cluster structure; the query
  *    slice (vec_id < 20) stays replica-0, so the declared ANN row
  *    measures a fixed query set against a K× corpus.
  *
  * Nine legs run the DECLARED lambdas verbatim (they already bind to
  * full tables); `dedup_cluster` swaps its 500-doc oracle slice for the
  * full K×-corpus library call (`minhashLshPairs` → CC) — the slice
  * exists for DuckDB's all-pairs oracle, not the operator.
  */
object SuiteScaleProbe {

  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 10
    val baseDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = s"/tmp/suite_scale_${k}x"
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

    // ---- generate the K× directory (skip tables already on disk) ------
    def gen(name: String)(scale: (DataFrame, Int) => DataFrame): Unit = {
      val path = s"$outDir/$name.parquet"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) {
        val base = spark.read.parquet(s"$baseDir/$name.parquet")
        (0 until k).map(i => scale(base, i)).reduce(_ unionAll _)
          .write.mode("overwrite").parquet(path)
      }
    }
    def off(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1
    val base = (n: String) => spark.read.parquet(s"$baseDir/$n.parquet")
    val (cOff, sOff, oOff, pOff) =
      (off(base("customer"), "c_custkey"), off(base("supplier"), "s_suppkey"),
        off(base("orders"), "o_orderkey"), off(base("part"), "p_partkey"))
    val (eOff, uOff) =
      (off(base("events"), "event_id"), off(base("events"), "user_id"))
    val (dOff, vOff) =
      (off(base("documents"), "doc_id"), off(base("embeddings"), "vec_id"))

    val t0gen = System.nanoTime()
    gen("nation")((df, i) => if (i == 0) df else df.limit(0))
    gen("region")((df, i) => if (i == 0) df else df.limit(0))
    gen("customer")((df, i) => df.withColumn("c_custkey", col("c_custkey") + i * cOff))
    gen("supplier")((df, i) => df.withColumn("s_suppkey", col("s_suppkey") + i * sOff))
    gen("part")((df, i) => df.withColumn("p_partkey", col("p_partkey") + i * pOff))
    gen("orders")((df, i) => df
      .withColumn("o_orderkey", col("o_orderkey") + i * oOff)
      .withColumn("o_custkey", col("o_custkey") + i * cOff))
    gen("lineitem")((df, i) => df
      .withColumn("l_orderkey", col("l_orderkey") + i * oOff)
      .withColumn("l_suppkey", col("l_suppkey") + i * sOff)
      .withColumn("l_partkey", col("l_partkey") + i * pOff))
    gen("events")((df, i) => df
      .withColumn("event_id", col("event_id") + i * eOff)
      .withColumn("user_id", col("user_id") + i * uOff)
      .withColumn("ts", expr(s"timestampadd(YEAR, $i, ts)")))
    gen("documents")((df, i) => df
      .withColumn("doc_id", col("doc_id") + i * dOff)
      .withColumn("text", expr(
        s"array_join(transform(split(text, ' '), t -> concat('r$i', '_', t)), ' ')"))
      .withColumn("n_chars", length(col("text")).cast("long")))
    gen("embeddings")((df, i) => df
      .withColumn("vec_id", col("vec_id") + i * vOff)
      .withColumn("embedding", expr(s"transform(embedding, x -> x + ${i}e-3f)")))
    println(f"[suite] generated ${k}x dir $outDir in ${(System.nanoTime() - t0gen) / 1e9}%.1f s")

    // ---- per-leg stage accounting --------------------------------------
    val shuffleBytes = new AtomicLong(0L)
    val peakExecMem = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          peakExecMem.getAndAccumulate(m.peakExecutionMemory, math.max(_, _))
        }
      }
    })

    val qs = graft.SparkEntry.queries
    val legs: Seq[(String, () => DataFrame)] = Seq(
      "graph_harmonic_hll" -> (() => qs("graph_harmonic_hll")(spark, outDir)),
      // full-corpus dedup (the declared row's 500-doc slice is oracle
      // plumbing): LSH pairs -> connected components over K×5000 docs
      "dedup_cluster_full" -> (() => graft.llm.Dedup.connectedComponents(
        graft.llm.Dedup.minhashLshPairs(spark,
          graft.Tables.documents(spark, outDir).select(col("doc_id"), col("text")))
          .select(col("doc_id1"), col("doc_id2")))),
      "ts_theil_sen" -> (() => qs("ts_theil_sen")(spark, outDir)),
      // the named follow-up from this sweep's first run: exact pairs are
      // O(T²) in calendar span (18× wall for 5× data) — the subsampled
      // estimator caps the per-type series at 1024 buckets
      "ts_theil_sen_smp" -> (() => graft.rel.TimeSeries.theilSenSampled(
        graft.Tables.events(spark, outDir), maxBucketsPerType = 1024)),
      "tokenizer_encode" -> (() => qs("tokenizer_encode")(spark, outDir)),
      "decontaminate_13" -> (() => qs("decontaminate_13")(spark, outDir)),
      "graph_pagerank" -> (() => qs("graph_pagerank")(spark, outDir)),
      "graph_link_pred" -> (() => qs("graph_link_pred")(spark, outDir)),
      "events_rfm" -> (() => qs("events_rfm")(spark, outDir)),
      "ann_ivf_kmeans" -> (() => qs("ann_ivf_kmeans")(spark, outDir)),
      "sql_q21" -> (() => qs("sql_q21")(spark, outDir)),
      // round-10 second-session rows: the declared lambdas verbatim
      "graph_hits" -> (() => qs("graph_hits")(spark, outDir)),
      "text_rake" -> (() => qs("text_rake")(spark, outDir)),
      "events_seq_mining" -> (() => qs("events_seq_mining")(spark, outDir)),
      "events_regex_funnel" -> (() => qs("events_regex_funnel")(spark, outDir)),
      "stats_mannwhitney" -> (() => qs("stats_mannwhitney")(spark, outDir)),
      "stats_bootstrap_ci" -> (() => qs("stats_bootstrap_ci")(spark, outDir)),
      "ts_sax" -> (() => qs("ts_sax")(spark, outDir)),
      "embedding_silhouette" -> (() => qs("embedding_silhouette")(spark, outDir)),
      // round-10 third-session rows: the midranks/grid stats family
      "stats_spearman" -> (() => qs("stats_spearman")(spark, outDir)),
      "stats_kruskal" -> (() => qs("stats_kruskal")(spark, outDir)),
      "stats_anova" -> (() => qs("stats_anova")(spark, outDir)),
      "stats_levene" -> (() => qs("stats_levene")(spark, outDir)),
      "stats_kendall" -> (() => qs("stats_kendall")(spark, outDir)),
      "anon_tcloseness" -> (() => qs("anon_tcloseness")(spark, outDir)),
      // thirty-fourth/fifth/sixth-wave rows
      "graph_random_walk" -> (() => qs("graph_random_walk")(spark, outDir)),
      "anon_dp_counts" -> (() => qs("anon_dp_counts")(spark, outDir)),
      "events_ab_assign" -> (() => qs("events_ab_assign")(spark, outDir)),
      "pii_pseudonymize" -> (() => qs("pii_pseudonymize")(spark, outDir)),
      "corpus_split" -> (() => qs("corpus_split")(spark, outDir)),
      "events_cuped" -> (() => qs("events_cuped")(spark, outDir)),
      "stats_effect_size" -> (() => qs("stats_effect_size")(spark, outDir)),
      "graph_walk_cooccur" -> (() => qs("graph_walk_cooccur")(spark, outDir)),
      "ts_hampel" -> (() => qs("ts_hampel")(spark, outDir)),
      // round-11 rows: biased walks, the BH battery, the declared
      // sampled theil-sen (ingest_manifest is 500-doc slice-bounded by
      // construction — constant in SF, no leg needed)
      "graph_node2vec_walk" -> (() => qs("graph_node2vec_walk")(spark, outDir)),
      "stats_fdr_bh" -> (() => qs("stats_fdr_bh")(spark, outDir)),
      "ts_theil_sen_sampled" -> (() => qs("ts_theil_sen_sampled")(spark, outDir)))

    // optional leg-name filter: args beyond <k> <baseDir> restrict the run
    val wanted = args.drop(2).toSet
    val selected = if (wanted.isEmpty) legs else legs.filter(l => wanted(l._1))
    selected.foreach { case (name, build) =>
      shuffleBytes.set(0L); peakExecMem.set(0L)
      val t0 = System.nanoTime()
      val n = build().count()
      val w = (System.nanoTime() - t0) / 1e9
      println(f"[suite] $name%-20s ${k}x wall=$w%7.1f s rows=$n%,d " +
        f"shuffle=${shuffleBytes.get / 1048576.0}%,.0f MiB " +
        f"peak_stage_mem=${peakExecMem.get / 1048576.0}%,.0f MiB")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
