package graft.tools

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Reliable-vs-local checkpoint cost probe: runs the two heaviest
  * iterative queries (`dedup_cluster` = LSH + connected components,
  * `graph_pagerank`) on the local[n] `localCheckpoint()` path and again
  * with a configured checkpoint dir (the cluster form `Ckpt.truncate`
  * switches to), reporting wall and checkpoint bytes written — the
  * numbers a cluster user needs to size the checkpoint interval and
  * storage. Local mode runs FIRST (SparkContext has no public un-set
  * for the dir). Usage: `tools/run.sh graft.tools.CkptProbe [sfdir]`.
  *
  * Value columns are forced through an aggregate, not `.count()` — the
  * repo's probe-methodology lesson: count lets Catalyst drop the very
  * joins being measured (SCALE.md's degenerate-plan correction).
  */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def force(df: org.apache.spark.sql.DataFrame): Long = {
      val c = df.columns.map(col)
      df.agg(sum(abs(hash(c: _*)).cast("long"))).head().getLong(0)
    }
    val legs: Seq[(String, () => Long)] = Seq(
      "dedup_cluster" -> (() => force(graft.llm.Dedup.minhashClusters(spark, sfDir))),
      "graph_pagerank" -> (() => force(graft.rel.Graph.pageRankQuery(spark, sfDir))))

    def dirBytes(f: File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)

    // pass 0 warms file-scan/JIT so the local-vs-reliable delta is the
    // checkpoint path, not first-touch noise
    val walls = (0 to 2).map { pass =>
      val ckptDir: Option[File] =
        if (pass == 2) Some(Files.createTempDirectory("graft-ckpt-probe").toFile) else None
      ckptDir.foreach(d => spark.sparkContext.setCheckpointDir(d.getAbsolutePath))
      val res = legs.map { case (name, run) =>
        val t0 = System.nanoTime()
        val sig = run()
        val wall = (System.nanoTime() - t0) / 1e9
        (name, wall, sig)
      }
      // storage-release audit (local path only — the reliable pass
      // below pins a checkpoint dir, which persists files not blocks):
      // an 8-round PageRank may leave only O(1) frames resident —
      // `Ckpt.release` frees round r−1 as round r materializes. Delta
      // counting (before vs after) isolates this run from earlier legs'
      // still-GC-pinned final frames. Pre-release this delta was
      // ~iters+2 (every round's blocks pinned until JVM GC).
      if (pass == 1) {
        def residentNow() = spark.sparkContext.getPersistentRDDs.values
          .filter(_.getStorageLevel.useMemory).toSeq
        val before = residentNow().map(_.id).toSet
        graft.rel.Graph.pageRank(
          graft.rel.Graph.custSuppEdges(spark, sfDir), iters = 8)
          .agg(sum(abs(hash(col("node"), col("rank"))).cast("long"))).head()
        val added = residentNow().filterNot(r => before.contains(r.id))
        println(s"[ckpt-probe] release-audit: 8-round pageRank left " +
          s"${added.length} new resident frames (edges + init + final expected)")
        require(added.length <= 3,
          s"release-audit: ${added.length} frames resident after 8 rounds — " +
            "Ckpt.release regressed (expected <= 3: edges, init, final)")
      }
      val bytes = ckptDir.map(dirBytes)
      ckptDir.foreach { d =>
        def rm(f: File): Unit = { Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); () }
        rm(d)
      }
      (res, bytes)
    }
    val (localRes, _) = walls(1)
    val (relRes, relBytes) = walls(2)
    localRes.zip(relRes).foreach { case ((name, wLoc, sigLoc), (_, wRel, sigRel)) =>
      require(sigLoc == sigRel, s"$name: reliable path changed values!")
      println(f"[ckpt-probe] $name local=$wLoc%.2f s reliable=$wRel%.2f s " +
        f"(${wRel / wLoc}%.2fx)")
    }
    println(f"[ckpt-probe] reliable checkpoint bytes=${relBytes.get}%,d " +
      f"(${relBytes.get / 1e6}%.1f MB) across both queries")
    spark.stop()
  }
}
