package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Focused probe for the persisted LSH index (round 10): ONE corpus
  * size, the 90/10 indexed/batch split, and the pipeline-owner
  * comparison — per-batch wall through the index vs re-running the
  * batch LSH pipeline over the full union. The asymptotic argument is
  * the stored side's SIGNATURE BUILD: the union path re-tokenizes and
  * re-minhashes the whole corpus every batch (O(corpus)), the index
  * path reads stored signatures and computes only the batch's
  * (O(batch + collisions)) — so the gap widens with index size, which
  * the small PipelineScaleProbe leg (20 k docs, comparable walls —
  * fixed costs dominate) cannot show.
  *
  * usage: tools/run.sh graft.tools.LshIndexProbe [nDocs=100000] [nBatches=3]
  */
object LshIndexProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 100000
    val nBatches = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the PipelineScaleProbe corpus: 80-token docs, every 20th a planted
    // near-dup of its predecessor (J ≈ 0.975) — each planted pair
    // crosses the %10 indexed/batch split
    val docPath = s"/tmp/scale_docs_idx_$nDocs"
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
    val indexed = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)

    var t0 = System.nanoTime()
    val idxPath = s"/tmp/scale_lshidx_big_$nDocs"
    Dedup.saveLshIndex(indexed, idxPath)
    println(f"[idx] build nDocs=${nDocs * 9 / 10} wall=${(System.nanoTime() - t0) / 1e9}%.1f s (once)")

    (1 to nBatches).foreach { b =>
      t0 = System.nanoTime()
      val n = Dedup.nearDupsAgainstIndex(spark, idxPath, batch).count()
      println(f"[idx] incremental batch#$b batch=${nDocs / 10} cross=$n " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    t0 = System.nanoTime()
    val nU = Dedup.minhashLshPairs(spark, docs)
      .filter((col("doc_id1") % 10 === 0) =!= (col("doc_id2") % 10 === 0))
      .count()
    println(f"[idx] union_repair nDocs=$nDocs cross=$nU " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s (every batch, without the index)")
    spark.stop()
  }
}
