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
}
