package graft.tools

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.Bucketing

/** Bucketed-join probe: puts numbers on the ingest-once/join-free-forever
  * trade `sources.Bucketing` exists for. Runs the lineitem ⋈ orders
  * equi-join three ways at sf0.1 — plain sort-merge (both sides shuffle
  * every query), the one-time bucketed ingest (the paid-once shuffle),
  * and the bucketed join (zero Exchange, asserted on the plan) — and
  * reports wall + shuffle-write bytes for each. The shuffle-byte column
  * is the one that predicts cluster behavior (the TsScaleProbe lesson:
  * local in-memory shuffles barely move wall). Values are forced through
  * an aggregate, not `.count()` (the degenerate-plan correction in
  * SCALE.md). Usage: `tools/run.sh graft.tools.BucketProbe [sfdir]`.
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val wh = Files.createTempDirectory("graft-bucket-probe").toFile
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh.getAbsolutePath)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffled = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffled.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    def force(df: org.apache.spark.sql.DataFrame): Long = {
      val c = df.columns.map(col)
      df.agg(sum(abs(hash(c: _*)).cast("long"))).head().getLong(0)
    }
    def timed[T](f: => T): (T, Double, Double) = {
      // listener events are async; a short settle beats poking the
      // private listenerBus (CurationScaleProbe precedent)
      Thread.sleep(500); shuffled.set(0)
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      (r, wall, shuffled.get / 1e6)
    }

    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))

    // warm file scans/JIT so leg deltas are the join path
    force(li.hint("merge").join(ord, "l_orderkey"))

    val (sigPlain, wPlain, mbPlain) = timed(force(li.hint("merge").join(ord, "l_orderkey")))
    println(f"[bucket-probe] plain SMJ:    wall=$wPlain%.2f s shuffleMB=$mbPlain%.1f (every query pays this)")

    // NOTE: bucketed writes emit NO shuffle-write metrics (bucketBy sorts
    // within write tasks and fans out files — there is no Exchange), so
    // the ingest cost is wall + the one-time write IO, not a shuffle-byte
    // figure; break-even is therefore computed on wall.
    val (_, wIngest, _) = timed {
      Bucketing.writeBucketed(li, "li_b", "l_orderkey", buckets = cpus.toInt)
      Bucketing.writeBucketed(ord, "ord_b", "l_orderkey", buckets = cpus.toInt)
    }
    println(f"[bucket-probe] ingest (×2):  wall=$wIngest%.2f s (paid ONCE; bucketed write shuffles nothing)")

    try {
      val bj = Bucketing.bucketedJoin(spark, "li_b", "ord_b", "l_orderkey")
      val plan = bj.queryExecution.executedPlan.toString
      require(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      val (sigB, wB, mbB) = timed(force(bj))
      require(sigB == sigPlain, "bucketed join changed values!")
      println(f"[bucket-probe] bucketed SMJ: wall=$wB%.2f s shuffleMB=$mbB%.1f " +
        f"(per-join shuffle ${mbPlain}%.1f → ${mbB}%.1f MB; ingest wall amortized after " +
        f"${math.ceil(wIngest / math.max(wPlain - wB, 0.05))}%.0f joins)")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
      def rm(f: File): Unit = { Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); () }
      rm(wh)
    }
    spark.stop()
  }
}
