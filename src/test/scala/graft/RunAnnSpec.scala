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
}
