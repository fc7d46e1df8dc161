package graft.run

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Distance, Knn}
import graft.llm.AnnSearch

/** ANN index-lifecycle runner — the vector-search sibling of
  * `RunFknn`/`RunCurate`/`RunMonitor` (round 10): ONE main that takes a
  * corpus through the workflow a vector-search deployment actually
  * runs — train coarse centroids (Lloyd's), PERSIST the
  * cell-partitioned index, load + search it for a query batch, and
  * measure recall@k against the exact brute-force ranking — with the
  * per-stage timing report and a predictions artifact. Composed
  * entirely from declared operators' builders (`kmeansCentroids`,
  * `saveIvfIndex`, `ivfSearchIndexed`, `Knn.knn`), so the oracle-gated
  * rows (`ann_ivf`, `ann_ivf_kmeans`, `ann_recall`) remain each
  * stage's correctness contract; the indexed search is spec-pinned
  * bit-identical to the inline path since round 9.
  *
  * ```
  * tools/run.sh graft.run.RunAnn <sfdir> <outdir> [k=5] [nprobe=2]
  * ```
  */
object RunAnn {

  case class StageResult(name: String, metric: Long, wall: Double)

  def run(spark: SparkSession, sfDir: String, outDir: String,
      k: Int = 5, nprobe: Int = 2): String = {
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Distance.asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val t = e.filter(col("vec_id") % 10 =!= 0)
      .select(col("vec_id").as("t_id"), col("v").as("t_v")).persist()
    val nQ = q.count()

    val stages = scala.collection.mutable.ArrayBuffer.empty[StageResult]
    def stage[A](name: String)(body: => (A, Long)): A = {
      val t0 = System.nanoTime()
      val (out, metric) = body
      stages += StageResult(name, metric, (System.nanoTime() - t0) / 1e9)
      out
    }

    // 1. coarse quantizer: Lloyd's from a deterministic stride seed
    //    (≈ one centroid per 40 train vectors — the ann_ivf_kmeans shape)
    val cent = stage("build_centroids") {
      // stride ≡ 1 (mod 40): a ≡ 0 stride would be a subset of the
      // ≡ 0 (mod 10) QUERY split and leave the train-side seed empty
      val seed = t.filter(col("t_id") % 40 === 1)
        .select(col("t_id").as("c_id"), col("t_v").as("c_v"))
      val c = AnnSearch.kmeansCentroids(t, seed, iters = 2).persist()
      (c, c.count())
    }
    // 2. persist the index: cell-partitioned corpus + centroid table
    val indexPath = s"$outDir/index"
    stage("save_index") {
      AnnSearch.saveIvfIndex(t, cent, indexPath)
      ((), spark.read.parquet(s"$indexPath/cells").select("cell").distinct().count())
    }
    // 3. load + search the PERSISTED index (partition-prunable probes)
    val results = stage("search_indexed") {
      val r = AnnSearch.ivfSearchIndexed(spark, indexPath, q, k, nprobe).persist()
      r.write.mode("overwrite").parquet(s"$outDir/results")
      (r, r.count())
    }
    // 4. recall@k vs the exact brute-force ranking (same L2 metric)
    val (recallPct, hitRows) = {
      val t0 = System.nanoTime()
      val brute = Knn.knn(q.select(col("q_id").as("vec_id"), col("q_v").as("v")),
        t.select(col("t_id").as("vec_id"), col("t_v").as("v")), k)
        .select(col("q_id"), col("t_id"))
      val hits = brute.join(results.select("q_id", "t_id"),
        Seq("q_id", "t_id"), "left_semi").count()
      val total = brute.count()
      stages += StageResult("recall_vs_exact", hits, (System.nanoTime() - t0) / 1e9)
      (hits.toDouble / total, total)
    }

    val report =
      s"""ann index run report
         |sfdir: $sfDir
         |k: $k
         |nprobe: $nprobe
         |n_queries: $nQ
         |stages: stage metric sec
         |${stages.map(st => f"  ${st.name} ${st.metric} ${st.wall}%.3f").mkString("\n")}
         |recall_at_$k: ${f"$recallPct%.4f"} ($hitRows exact rows)
         |""".stripMargin
    Files.createDirectories(Paths.get(outDir))
    Files.writeString(Paths.get(s"$outDir/report.txt"), report)
    spark.catalog.clearCache()
    report
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunAnn <sfdir> <outdir> [k] [nprobe]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.functions.TopKAgg.FallbackConfKey,
        graft.functions.TopKAgg.FallbackThreshold.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = if (args.length > 2) args(2).toInt else 5
    val nprobe = if (args.length > 3) args(3).toInt else 2
    print(run(spark, args(0), args(1), k, nprobe))
    spark.stop()
  }
}
