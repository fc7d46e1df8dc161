package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LONG-HORIZON streaming soak (round 16, VERDICT r15 #3): every gate
  * row drives exactly 2 micro-batches through a fresh checkpoint;
  * nothing measured N ≫ 2 drops through ONE long-lived checkpoint —
  * the operational surface a recurring production ingest actually
  * exercises. This drives `N` drops through one `RunIngestStream`
  * checkpoint and reports, per batch: wall, appended docs, and the
  * checkpoint's file-source metadata growth (sources log files/bytes —
  * the seen-files log compacts every 10 batches by default, and its
  * compact file grows with TOTAL files seen, which is the long-run
  * cost to watch).
  *
  * At batch N/2 it performs a REAL kill-window replay: after the drain,
  * delete the checkpoint's latest `commits/<id>` file — exactly the
  * state a crash between the batch's side effects and its commit leaves
  * — and restart the stream. Structured Streaming replays the batch
  * from its offsets; `ingestDelta`'s id_new guard must make the replay
  * a no-op (appended = 0, corpus count unchanged). RunIngestSpec pins
  * the same replay at spec scale.
  *
  * usage: tools/run.sh graft.tools.StreamSoakProbe [sfdir] [nDrops=16]
  */
object StreamSoakProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val nDrops = if (args.length > 1) args(1).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "4") // the gate rows' slice scale
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = Files.createTempDirectory("streamsoak").toString
    val out = s"$tmp/state"
    Files.createDirectories(Paths.get(out))
    val docs = graft.Tables.documents(spark, sfDir).filter(col("doc_id") < 500)
      .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
    val corp0 = docs.filter(col("doc_id") % 5 =!= 1 && col("doc_id") % 5 =!= 3)
    graft.llm.Dedup.saveLshIndex(corp0, s"$out/index")
    graft.sources.Sinks.writePartitioned(corp0, s"$out/corpus", Seq("source"))
    val incoming = docs.filter(col("doc_id") % 5 === 1 || col("doc_id") % 5 === 3)

    def dirStats(p: String): (Long, Long) = {
      val path = Paths.get(p)
      if (!Files.exists(path)) return (0L, 0L)
      import scala.jdk.CollectionConverters._
      val fs = Files.walk(path).iterator().asScala.filter(Files.isRegularFile(_)).toSeq
      (fs.size.toLong, fs.map(Files.size(_)).sum)
    }
    def corpusN(): Long = spark.read.parquet(s"$out/corpus").count()

    println(f"[soak] ${"batch"}%-7s ${"wall_s"}%7s ${"appended"}%8s ${"corpus"}%7s " +
      f"${"src_files"}%9s ${"src_bytes"}%9s ${"ckpt_bytes"}%10s")
    for (k <- 0 until nDrops) {
      incoming.filter(pmod(xxhash64(col("doc_id")), lit(nDrops)) === k)
        .coalesce(1).write.mode("append").parquet(s"$tmp/drops")
      val t0 = System.nanoTime()
      val runs = graft.run.RunIngestStream.runWithStages(spark, s"$tmp/drops", out)
      val wall = (System.nanoTime() - t0) / 1e9
      val app = runs.map(_._3).sum
      val (sf, sb) = dirStats(s"$out/_ckpt/ingest/sources")
      val (_, cb) = dirStats(s"$out/_ckpt/ingest")
      println(f"[soak] b$k%-6d $wall%7.2f $app%8d ${corpusN()}%7d $sf%9d $sb%9d $cb%10d")
      if (k == nDrops / 2) {
        // kill-window replay: offsets committed, commit file lost
        import scala.jdk.CollectionConverters._
        val commits = Files.list(Paths.get(s"$out/_ckpt/ingest/commits"))
          .iterator().asScala.toSeq
          .filter(p => p.getFileName.toString.forall(_.isDigit))
        val latest = commits.maxBy(_.getFileName.toString.toLong)
        Files.delete(latest)
        // local-FS artifact: the checksum layer keeps a hidden .N.crc
        // sibling that would collide with the replay's rename (HDFS /
        // object stores have no client-side crc files)
        Files.deleteIfExists(latest.resolveSibling("." + latest.getFileName + ".crc"))
        val before = corpusN()
        val t1 = System.nanoTime()
        val replay = graft.run.RunIngestStream.runWithStages(spark, s"$tmp/drops", out)
        val w1 = (System.nanoTime() - t1) / 1e9
        val after = corpusN()
        println(f"[soak] replay@b$k wall=$w1%.2f s batches=${replay.size} " +
          s"appended=${replay.map(_._3).sum} corpus $before -> $after " +
          s"(idempotent=${before == after && replay.map(_._3).sum == 0})")
      }
    }
    spark.stop()
  }
}
