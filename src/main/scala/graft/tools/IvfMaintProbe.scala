package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Distance, Knn}
import graft.llm.AnnSearch

/** Maintenance-loop probe (round 13, VERDICT r12 "What's missing #2"):
  * measures what IVF drift actually costs and what `RunAnn.maintain`'s
  * retrain buys back. Build an index on the harness embeddings, append
  * a DRIFTED copy of the corpus (every coordinate shifted — a new data
  * distribution the stored centroids never saw, so the whole append
  * lands in the few nearest cells), then measure, before and after the
  * retrain trigger:
  *
  *   - cell balance (max/median — the trigger's own statistic),
  *   - recall@5 of drifted queries vs exact brute force over the full
  *     post-append corpus,
  *   - probed rows per query (Σ probed-cell sizes / |Q|, nprobe = 2) —
  *     the COST axis: within-cell search is exact, so imbalance shows
  *     up FIRST as every drifted probe scanning one huge cell, not as
  *     missed neighbors.
  *
  * `tools/run.sh graft.tools.IvfMaintProbe [sfdir] [outdir]`
  */
object IvfMaintProbe {

  private def balance(spark: SparkSession, path: String): (Double, Long) = {
    val r = spark.read.parquet(s"$path/cells")
      .groupBy("cell").agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("mx"), expr("percentile(n, 0.5)").as("med"),
        count(lit(1)).as("cells")).head()
    (r.getLong(0) / math.max(1.0, r.getDouble(1)), r.getLong(2))
  }

  private def probedRowsPerQuery(spark: SparkSession, path: String,
      q: DataFrame, nprobe: Int): Double = {
    val (cells, cent) = AnnSearch.loadIvfIndex(spark, path)
    val sizes = cells.groupBy("cell").agg(count(lit(1)).as("n"))
    AnnSearch.assignCellsMulti(q, cent, nprobe)
      .join(sizes, "cell")
      .agg((sum(col("n")) / countDistinct(col("t_id"))).as("rpq"))
      .head().getDouble(0)
  }

  private def recallAt5(spark: SparkSession, path: String,
      q: DataFrame, corpus: DataFrame): Double = {
    val ivf = AnnSearch.ivfSearchIndexed(spark, path,
      q.select(col("t_id").as("q_id"), col("t_v").as("q_v")), k = 5, nprobe = 2)
    val brute = Knn.knn(
      q.select(col("t_id").as("vec_id"), col("t_v").as("v")),
      corpus.select(col("t_id").as("vec_id"), col("t_v").as("v")), 5)
      .select(col("q_id"), col("t_id"))
    val hits = brute.join(ivf.select("q_id", "t_id"),
      Seq("q_id", "t_id"), "left_semi").count()
    hits.toDouble / math.max(1L, brute.count())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("ivfmaint").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("t_id"),
        Distance.asDouble(col("embedding")).as("t_v"))
      .persist()
    val n = e.count()
    val indexPath = s"$outDir/index"
    // pre-drift world: stride centroids over the original distribution
    val cent = e.filter(col("t_id") % 40 === 0)
      .select(col("t_id").as("c_id"), col("t_v").as("c_v"))
    AnnSearch.saveIvfIndex(e, cent, indexPath)
    val (b0, c0) = balance(spark, indexPath)
    println(f"[maint] built: $n vecs, $c0 cells, balance=$b0%.2f")

    // drift: the SAME vectors shifted by +2 in every coordinate under
    // fresh ids — a distribution the stored centroids never saw
    val drift = e.select((col("t_id") + 10000000L).as("t_id"),
      expr("transform(t_v, x -> x + 2.0d)").as("t_v")).persist()
    AnnSearch.appendToIvfIndex(spark, drift, indexPath)
    val full = e.unionAll(drift).persist()
    val q = drift.filter(col("t_id") % 10 === 0).persist()
    val (b1, c1) = balance(spark, indexPath)
    val r1 = recallAt5(spark, indexPath, q, full)
    val p1 = probedRowsPerQuery(spark, indexPath, q, 2)
    println(f"[maint] drifted: balance=$b1%.2f cells=$c1 recall@5=$r1%.4f probed_rows/q=$p1%.1f")

    val report = graft.run.RunAnn.maintain(spark, outDir, maxRatio = 4.0)
    println(report.linesIterator.map("[maint] " + _).mkString("\n"))

    val (b2, c2) = balance(spark, indexPath)
    val r2 = recallAt5(spark, indexPath, q, full)
    val p2 = probedRowsPerQuery(spark, indexPath, q, 2)
    println(f"[maint] retrained: balance=$b2%.2f cells=$c2 recall@5=$r2%.4f probed_rows/q=$p2%.1f")

    // baseline: what a FRESH build over the post-drift corpus gives at
    // the same stride density — the quality/cost point the retrain
    // should land on (the drifted index's recall@5 = 1.0 is an
    // artifact: one cell held the whole drift cluster, so every probe
    // was a half-index brute-force scan)
    val freshPath = s"$outDir/fresh"
    val freshCent = full.filter(col("t_id") % 40 === 0)
      .select(col("t_id").as("c_id"), col("t_v").as("c_v"))
    AnnSearch.saveIvfIndex(full, freshCent, freshPath)
    val (b3, c3) = balance(spark, freshPath)
    val r3 = recallAt5(spark, freshPath, q, full)
    val p3 = probedRowsPerQuery(spark, freshPath, q, 2)
    println(f"[maint] fresh-built: balance=$b3%.2f cells=$c3 recall@5=$r3%.4f probed_rows/q=$p3%.1f")
    spark.stop()
  }
}
