package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.run.RunMonitor

/** End-to-end spec for the streaming monitoring runner: all four
  * monitors run concurrently over one MemoryStream feed, the parquet
  * sinks must reconcile with the BATCH twins on closed hours (the batch
  * twins are the oracle-gated rows, so this chains the runner's outputs
  * to DuckDB-checked numbers), and the report must agree with the sunk
  * rows.
  */
class RunMonitorSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("RunMonitor end-to-end: five monitors, parquet sinks ≡ batch twins on closed hours, report reconciles") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 12 populated hours, 1-in-10 errors; hour 11 is a 30-event all-error
    // outage (heavy enough that the 6 h slow window burns > 1.0 — a
    // 10-event spike would land exactly AT 1.0 and correctly not page);
    // a final hour-13 sentinel closes hour 11 and advances the watermark
    // past hours 0-11 for the windowed monitors
    val rows = (0 until 12).flatMap { h =>
      val nEv = if (h == 11) 30 else 10
      (0 until nEv).map { i =>
        val typ = if (h == 11) "error" else if (i == 0) "error" else "view"
        Ev((h * 100 + i).toLong, new Timestamp(h * 3600000L), (i % 3).toLong, typ,
          10.0 + h + 0.1 * i)
      }
    } :+ Ev(9999L, new Timestamp(13 * 3600000L), 1L, "view", 1.0)
    val batchDf = rows.toDF()
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))

    // factory: one identically-fed MemoryStream PER monitor (a query's
    // commit purges the shared buffer — see RunMonitor.run's scaladoc)
    val out = java.nio.file.Files.createTempDirectory("monitor").toString
    // drift baseline trained offline on the same feed (the main's shape)
    val baseline = graft.rel.TimeSeries.cusumBaselineE6(batchDf)
    val report = RunMonitor.run(spark, () => {
      val mem = MemoryStream[Ev]
      mem.addData(rows: _*)
      mem.toDF()
    }, out, baseline)

    // --- per-sink reconciliation against the batch twins ----------------
    // error_rate: closed hours = those the final watermark passed
    val erStream = spark.read.parquet(s"$out/error_rate")
      .collect().map(_.toSeq).toSet
    val erBatch = graft.rel.TimeSeries.errorRateHourly(batchDf)
      .collect().map(_.toSeq).toSet
    assert(erStream.nonEmpty && erStream.subsetOf(erBatch),
      "every emitted error-rate hour must match the batch Wilson row")

    // slo_burn: emits on close → all 12 populated hours closed by the
    // sentinel; batch computes the same 13 populated hours (incl. the
    // sentinel's own open hour, which the stream has not closed)
    val sloStream = spark.read.parquet(s"$out/slo_burn")
      .collect().map(_.toSeq).toSet
    val sloBatch = graft.rel.TimeSeries.sloBurn(batchDf)
      .collect().map(_.toSeq).toSet
    assert(sloStream.size === 12)
    assert(sloStream.subsetOf(sloBatch), "stream burn rows ≡ batch on closed hours")
    val pages = spark.read.parquet(s"$out/slo_burn").filter(col("page")).count()
    assert(pages >= 1, "the all-error hour must page")

    // drawdown: closed hours ≡ batch rows below each TYPE's open hour
    // (state is per event_type — "error" last fires in hour 11, so its
    // hour-11 row stays open; "view" is closed through hour 10 by the
    // hour-13 sentinel)
    val ddStream = spark.read.parquet(s"$out/drawdown")
      .select("event_type", "hs", "v", "peak_v", "drawdown")
      .collect().map(_.toSeq).toSet
    val ddBatch = graft.rel.TimeSeries.tsDrawdown(batchDf)
      .filter((col("event_type") === "error" && col("hs") < 11 * 3600L) ||
        (col("event_type") === "view" && col("hs") < 13 * 3600L))
      .collect().map(_.toSeq).toSet
    assert(ddStream === ddBatch)

    // unique_users: closed watermarked windows match the batch count
    val uuStream = spark.read.parquet(s"$out/unique_users")
      .collect().map(_.toSeq).toSet
    val uuBatch = Streaming0.uniqueUsers(batchDf)
      .collect().map(_.toSeq).toSet
    assert(uuStream.nonEmpty && uuStream.subsetOf(uuBatch))

    // cusum: closed hours ≡ the fixed-baseline batch form below each
    // type's open hour (the drawdown closure rule)
    val cuStream = spark.read.parquet(s"$out/cusum")
      .select("event_type", "hs", "v", "cusum_pos", "alarm")
      .collect().map(_.toSeq).toSet
    val cuBatch = graft.rel.TimeSeries.cusumFixedBaselineHourly(batchDf, baseline)
      .filter((col("event_type") === "error" && col("hs") < 11 * 3600L) ||
        (col("event_type") === "view" && col("hs") < 13 * 3600L))
      .select("event_type", "hs", "v", "cusum_pos", "alarm")
      .collect().map(_.toSeq).toSet
    assert(cuStream === cuBatch)

    // hampel: every emitted row ≡ the batch detail twin (rows that have
    // three later closed hours; a subset-equality on the emitted set)
    val haStream = spark.read.parquet(s"$out/hampel")
      .select("event_type", "hs", "v", "med_v", "flag")
      .collect().map(_.toSeq).toSet
    val haBatch = graft.rel.TimeSeries.hampelDetail(batchDf)
      .select(col("event_type"), col("hs"), col("v"),
        graft.rel.Queries.rnd(col("med") / 1e6, 6).as("med_v"), col("flag"))
      .collect().map(_.toSeq).toSet
    assert(haStream.nonEmpty && haStream.subsetOf(haBatch))

    // --- report reconciles with the sinks -------------------------------
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/report.txt")) === report)
    val reported = report.linesIterator.filter(_.startsWith("  "))
      .map { l => val p = l.trim.split(" "); p(0) -> p(1).toLong }.toMap
    assert(reported("error_rate") === erStream.size.toLong)
    assert(reported("slo_burn") === 12L)
    assert(reported("drawdown") === ddStream.size.toLong)
    assert(reported("unique_users") === uuStream.size.toLong)
    assert(reported("cusum") === cuStream.size.toLong)
    assert(reported("hampel") === haStream.size.toLong)
    assert(report.contains(s"slo_pages: $pages"))
    assert(report.contains("cusum_alarm_hours: "))
    assert(report.contains("hampel_spike_hours: "))
  }

  /** Batch unique-users twin over an arbitrary frame (the declared row
    * binds to the events table; the transform is the shared piece). */
  private object Streaming0 {
    def uniqueUsers(df: org.apache.spark.sql.DataFrame) =
      graft.llm.Streaming.uniqueUsersTransform(df)
  }
}
