package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{AnnSearch, Dedup}

/** Scale experiment for the LLM-pipeline families (complement of
  * `ScaleProbe`, which covers the kNN kernel): MinHash-LSH dedup over an
  * N-doc synthetic corpus with planted near-duplicates, and IVF ANN over
  * an N-vector synthetic embedding table.
  *
  * usage: tools/run.sh graft.tools.PipelineScaleProbe [nDocs] [nVecs] [nQueries]
  *
  * Corpus: 80-token docs over a 10k-word vocabulary, hash-seeded (no RNG
  * state). Every 20th doc is a copy of its predecessor with the last
  * token replaced — a planted ~J=0.975 near-dup the LSH pass must find.
  */
object PipelineScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 50000
    val nVecs = if (args.length > 1) args(1).toInt else 100000
    val nQ = if (args.length > 2) args(2).toInt else 1000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.TopKAgg.tune(spark)

    // ---- dedup: MinHash-LSH over N docs --------------------------------
    val docPath = s"/tmp/scale_docs_$nDocs"
    spark.range(nDocs)
      .select(col("id").as("doc_id"),
        expr("IF(id % 20 = 1, id - 1, id)").as("base"),
        expr("IF(id % 20 = 1, 1, 0)").as("mut"))
      .select(col("doc_id"), expr(
        """concat(
          |  array_join(transform(sequence(1, 79), j ->
          |    concat('w', cast(abs(hash(concat(cast(base AS string), ':', cast(j AS string)))) % 10000 AS string))), ' '),
          |  ' ', IF(mut = 1, concat('m', cast(doc_id AS string)),
          |    concat('w', cast(abs(hash(concat(cast(base AS string), ':80'))) % 10000 AS string))))""".stripMargin)
        .as("text"))
      .write.mode("overwrite").parquet(docPath)
    val docs = spark.read.parquet(docPath)

    var t0 = System.nanoTime()
    val dupPairs = Dedup.minhashLshPairs(spark, docs).count()
    val tDedup = (System.nanoTime() - t0) / 1e9
    val planted = if (nDocs >= 2) (nDocs + 18) / 20 else 0 // ids 1,21,41,… < nDocs
    println(f"[scale] minhash_lsh nDocs=$nDocs pairs=$dupPairs (planted≈$planted) " +
      f"wall=$tDedup%.1f s (${nDocs / tDedup}%.0f docs/s)")

    // ---- ANN: IVF over N vectors ---------------------------------------
    val vecPath = s"/tmp/scale_vecs_$nVecs"
    spark.range(nVecs)
      .select(col("id").as("vec_id"),
        expr("transform(sequence(1, 64), i -> sin(id * 131 + i))").as("v"))
      .write.mode("overwrite").parquet(vecPath)
    val vecs = spark.read.parquet(vecPath)
    val nCells = math.max(32, nVecs / 1000) // ~1k vectors per cell
    val q = vecs.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val t = vecs.filter(col("vec_id") >= nQ)
      .select(col("vec_id").as("t_id"), col("v").as("t_v"))
    val cent = vecs.filter(col("vec_id") >= nQ &&
        col("vec_id") % (nVecs / nCells) === 0)
      .select(col("vec_id").as("c_id"), col("v").as("c_v"))

    t0 = System.nanoTime()
    val ivf = AnnSearch.ivfSearch(q, t, cent, k = 10, nprobe = 4)
      .select(col("q_id"), col("t_id")).persist()
    val ivfRows = ivf.count()
    val tIvf = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    val brute = graft.core.Knn.knn(
      q.select(col("q_id").as("vec_id"), col("q_v").as("v")),
      t.select(col("t_id").as("vec_id"), col("t_v").as("v")), 10)
      .select(col("q_id"), col("t_id")).persist()
    val bruteRows = brute.count()
    val tBrute = (System.nanoTime() - t0) / 1e9
    // recall: an approximate method's wall time means nothing without it
    val hits = ivf.join(brute, Seq("q_id", "t_id"), "left_semi").count()
    val recall = hits.toDouble / bruteRows
    println(f"[scale] ann nVecs=$nVecs nQ=$nQ cells≈$nCells ivf=$ivfRows rows in $tIvf%.1f s; " +
      f"brute=$bruteRows rows in $tBrute%.1f s (speedup ${tBrute / tIvf}%.1fx, recall $recall%.3f)")
    spark.stop()
  }
}
