package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sinks

class SinksSpec extends SparkSpecBase {

  test("writePartitioned layout is partition-pruned on read") {
    val dir = Files.createTempDirectory("graft_sink_part").toString
    val events = Tables.events(spark, sfDir)
    Sinks.writePartitioned(events, dir, Seq("event_type"))
    val back = spark.read.parquet(dir).filter(col("event_type") === "click")
    // the partition filter must reach the scan (directory pruning)
    val scan = back.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty,
      s"no partition filters in: ${scan.partitionFilters}")
    // and the data round-trips
    assert(back.count() === events.filter(col("event_type") === "click").count())
  }

  test("compact refuses in-place / overlapping output (overwrite would eat the input)") {
    val in = Files.createTempDirectory("graft_sink_guard").toString
    Tables.events(spark, sfDir).limit(10).write.mode("overwrite").parquet(in)
    intercept[IllegalArgumentException](Sinks.compact(spark, in, in))
    intercept[IllegalArgumentException](Sinks.compact(spark, in, in + "/sub"))
  }

  test("compact collapses a small-file mess without losing rows") {
    val in = Files.createTempDirectory("graft_sink_in").toString
    val out = Files.createTempDirectory("graft_sink_out").toString
    val events = Tables.events(spark, sfDir)
    events.repartition(40).write.mode("overwrite").parquet(in)
    val (before, after) = Sinks.compact(spark, in, out, targetBytes = 512L * 1024)
    assert(before === 40)
    assert(after < before)
    assert(spark.read.parquet(out).count() === events.count())
    // content equality, not just counts
    assert(collectSet(spark.read.parquet(out).select("event_id", "user_id")) ===
      collectSet(events.select("event_id", "user_id")))
  }

  test("swapIn swaps the fresh table in and clears the backup") {
    val dir = Files.createTempDirectory("graft_swap").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.range(5).write.parquet(s"$dir/t")
    spark.range(100, 103).write.parquet(s"$dir/.compact_t")
    Sinks.swapIn(fs, dir, "t")
    assert(collectSet(spark.read.parquet(s"$dir/t")) ===
      Set(Seq(100L), Seq(101L), Seq(102L)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.old_t")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.compact_t")))
  }

  test("swapIn after a crash that left a stale .old_ backup still swaps (no silent rename failure)") {
    val dir = Files.createTempDirectory("graft_swap_stale").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.range(5).write.parquet(s"$dir/t")
    // a previous swap crashed between its second rename and the backup
    // delete: live is current, .old_ holds the pre-swap generation.
    // Hadoop rename returns FALSE on an existing target, so the
    // unchecked-rename form left the old table live while reporting
    // success — the resurrection hazard swapIn's recoverSwap closes.
    spark.range(900, 910).write.parquet(s"$dir/.old_t")
    spark.range(200, 202).write.parquet(s"$dir/.compact_t")
    Sinks.swapIn(fs, dir, "t")
    assert(collectSet(spark.read.parquet(s"$dir/t")) === Set(Seq(200L), Seq(201L)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.old_t")))
  }

  test("recoverSwap restores a live table lost mid-swap from its .old_ backup") {
    val dir = Files.createTempDirectory("graft_swap_recover").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash between rename(live -> old) and rename(compact -> live):
    // live is missing, .old_ holds the only copy
    spark.range(7).write.parquet(s"$dir/.old_t")
    Sinks.recoverSwap(fs, dir, "t")
    assert(spark.read.parquet(s"$dir/t").count() === 7)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.old_t")))
  }

  test("retracted docs stay retracted through a compaction after a crashed swap (no resurrection)") {
    val dir = Files.createTempDirectory("graft_lsh_resurrect").toString
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 30)
      .select(col("doc_id"), col("text"))
    graft.llm.Dedup.saveLshIndex(docs, s"$dir/index")
    // simulate a crashed previous compaction: a stale .old_sigs backup
    spark.range(1).write.parquet(s"$dir/index/.old_sigs")
    val gone = spark.range(3).select(col("id").as("doc_id"))
    graft.llm.Dedup.removeFromLshIndex(gone, s"$dir/index")
    graft.llm.Dedup.compactLshIndex(spark, s"$dir/index")
    // tombstones were cleared by the compaction — the PHYSICAL table
    // must no longer carry the retracted ids
    val left = spark.read.parquet(s"$dir/index/docs")
      .join(gone, Seq("doc_id"), "left_semi").count()
    assert(left === 0, s"retracted docs resurrected after crashed-swap compaction: $left")
  }
}
