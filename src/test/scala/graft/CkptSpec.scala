package graft

import java.io.File
import java.nio.file.Files

import graft.core.Ckpt

/** The checkpoint seam: `Ckpt.truncate` must use reliable `checkpoint()`
  * exactly when a checkpoint dir is configured, and the iterative
  * operators must produce identical results on either path (checkpointing
  * changes no values — only lineage and fault tolerance).
  */
class CkptSpec extends SparkSpecBase {

  /** SparkContext has no public un-set for the checkpoint dir; the spec
    * restores the shared session's `None` via reflection so later suites
    * keep the local path.
    */
  private def resetCheckpointDir(): Unit = {
    val f = spark.sparkContext.getClass.getDeclaredField("checkpointDir")
    f.setAccessible(true)
    f.set(spark.sparkContext, None)
  }

  test("truncate picks reliable checkpoint() iff a checkpoint dir is set") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_id1", "doc_id2")

    // local path (no dir): works, leaves no checkpoint files anywhere
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    val localCc = collectSet(graft.llm.Dedup.connectedComponents(pairs))
    assert(localCc.nonEmpty)

    val dir = Files.createTempDirectory("graft-ckpt").toFile
    spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
    try {
      // one-frame truncate lands RDD checkpoint files in the dir
      // (setCheckpointDir eagerly creates a UUID subdir; rdd-* appears
      // under it only when a reliable checkpoint actually runs)
      assert(Ckpt.truncate(pairs).count() === 4)
      val rddDirs = dir.listFiles.flatMap(u => Option(u.listFiles).getOrElse(Array.empty[File]))
        .filter(_.getName.startsWith("rdd-"))
      assert(rddDirs.nonEmpty, s"reliable checkpoint() left no rdd-* dirs under $dir")

      // full iterative operators on the reliable path match the local path
      val reliableCc = collectSet(graft.llm.Dedup.connectedComponents(pairs))
      assert(reliableCc === localCc)
      // PageRank (per-round truncation) and BPE training (per-merge
      // truncation + the one-row argmax checkpoint) — values must be
      // path-independent
      import spark.implicits._
      val half = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
      val edges = half.unionAll(half.select($"dst".as("src"), $"src".as("dst")))
      val pr = graft.rel.Graph.pageRank(edges, iters = 3).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(pr.size === 3 && math.abs(pr.values.sum - 1.0) < 1e-4)
      // multi-character words — single-char words have no adjacent
      // symbol pairs and BPE would exhaust at round 1 with no rules
      val docs = Seq((0L, "abab abab cdcd"), (1L, "abab cdcd")).toDF("doc_id", "text")
      val rules = graft.llm.TextAnalysis.bpeMerges(docs, rounds = 2).collect()
      assert(rules.length === 2 && rules.map(_.getString(1)).forall(_.nonEmpty))
    } finally {
      resetCheckpointDir()
      def rm(f: File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "spec must restore the shared session's local path")
  }
}
