package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.llm.Streaming

case class Ev(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

/** Structured-Streaming twins vs their batch formulations (SURVEY §5.2
  * layer 4): the same transform must produce the same result set when fed
  * incrementally, and watermarks must drop late rows.
  */
class StreamingSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val evs = Seq(
    Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
    Ev(2, ts("2024-01-01 10:20:00"), 1, "click", 2.0),
    Ev(3, ts("2024-01-01 10:40:00"), 2, "view", 3.0),
    Ev(4, ts("2024-01-01 11:10:00"), 1, "click", 4.0),
    Ev(5, ts("2024-01-01 13:00:00"), 2, "view", 5.0))

  test("tumbling stream (complete mode) ≡ batch tumbling on same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(evs: _*)
    val q = Streaming.tumblingTransform(mem.toDF())
      .writeStream.format("memory").queryName("tumb").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = collectSet(spark.table("tumb"))
    val batch = collectSet(Streaming.tumblingTransform(evs.toDF()))
    assert(streamed === batch)
  }

  test("tumbling stream with watermark drops late rows (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streaming.tumblingStream(mem.toDF())
      .writeStream.format("memory").queryName("tumb_wm").outputMode("append").start()
    try {
      // batch 1: two 10:xx clicks; a 13:00 row advances the watermark to
      // 12:50 → the 10:00 and 11:00 windows close and are emitted.
      mem.addData(evs: _*)
      q.processAllAvailable()
      // batch 2: a LATE 10:30 click (watermark already at 12:50) → dropped.
      mem.addData(Ev(6, ts("2024-01-01 10:30:00"), 1, "click", 100.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("tumb_wm")
    val clicks10 = out.filter(col("event_type") === "click" &&
      col("ws") === ts("2024-01-01 10:00:00").getTime / 1000).select("n").collect()
    assert(clicks10.map(_.getLong(0)).toSeq === Seq(2), "late row must not be counted")
  }

  test("file-source readStream → tumbling → memory sink ≡ batch query") {
    // stage the events table as a directory of parquet files (file
    // streams watch directories; ts arrives as nanos-long post-copy)
    val dir = java.nio.file.Files.createTempDirectory("evstream").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").write.mode("overwrite").parquet(dir)
    val streamed = Streaming.tumblingTransform(Streaming.eventsFileStream(spark, dir))
      .writeStream.format("memory").queryName("tumb_file").outputMode("complete").start()
    try streamed.processAllAvailable() finally streamed.stop()
    val batch = Streaming.tumbling(spark, sfDir)
    assert(collectSet(spark.table("tumb_file")) === collectSet(batch))
  }

  test("readStream → transform → writeStream PARQUET sink (append + checkpoint) ≡ batch") {
    // the full production loop: file source → watermarked tumbling agg →
    // durable parquet sink with a checkpoint dir (exactly-once contract);
    // append mode emits only watermark-sealed windows, so compare against
    // the batch result restricted to sealed windows
    val src = java.nio.file.Files.createTempDirectory("evsink_src").toString
    val out = java.nio.file.Files.createTempDirectory("evsink_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("evsink_ckpt").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").write.mode("overwrite").parquet(src)
    val q = Streaming.tumblingStream(Streaming.eventsFileStream(spark, src))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val sealedBatch = Streaming.tumbling(spark, sfDir)
    val written = spark.read.parquet(out)
    // every written row is a correct batch row (exact equality is not
    // guaranteed: the final watermark leaves trailing windows unsealed)
    assert(written.count() > 0)
    assert(written.join(sealedBatch,
      Seq("ws", "event_type", "n", "sv"), "left_anti").count() === 0)
  }

  test("sliding (hopping) window stream (complete mode) ≡ batch sliding on same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(evs: _*)
    val q = Streaming.slidingTransform(mem.toDF())
      .writeStream.format("memory").queryName("slide").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    assert(collectSet(spark.table("slide")) ===
      collectSet(Streaming.slidingTransform(evs.toDF())))
  }

  test("dropDuplicates streaming twin ≡ batch window dedup on in-order source") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(evs: _*) // evs arrive in ts order → first-arrived = first-by-ts
    val q = Streaming.dedupStream(mem.toDF())
      .writeStream.format("memory").queryName("dedup_s").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = collectSet(spark.table("dedup_s"))
    val batch = collectSet(Streaming.dedupFirstTransform(evs.toDF()))
    assert(streamed === batch)
    // keyed shape: exactly one row per (user_id, event_type)
    assert(spark.table("dedup_s").groupBy("user_id", "event_type").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("flatMapGroupsWithState sessionizer (batch mode) ≡ window sessionize") {
    import spark.implicits._
    val static = evs.toDF()
    val custom = Streaming.sessionizeCustomState(static)
      .select(col("user_id"), col("session_id"), col("n_events"),
        graft.rel.Queries.rnd(col("sv"), 6).as("sv"))
    val batch = Streaming.sessionizeTransform(static)
    assert(collectSet(custom) === collectSet(batch))
  }

  test("flatMapGroupsWithState sessionizer (streaming) emits sessions on watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streaming.sessionizeCustomState(mem.toDF())
      .writeStream.format("memory").queryName("sess_fmgws").outputMode("append").start()
    val late = Ev(7, ts("2024-01-01 21:00:00"), 1, "click", 9.0)
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      // sentinel user 99 far in the future: advances the watermark past
      // every open session's timeout; its own session stays parked.
      mem.addData(Ev(100, ts("2024-01-01 20:00:00"), 99, "click", 0.0))
      q.processAllAvailable()
      // user 1 returns AFTER its sessions timed out: the closed-marker
      // state must continue the session numbering (id 3, not restart at
      // 1 — batch numbering alignment). A second sentinel flushes it.
      mem.addData(late)
      q.processAllAvailable()
      mem.addData(Ev(101, ts("2024-01-02 04:00:00"), 98, "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("sess_fmgws")
      .filter(col("user_id") =!= 99 && col("user_id") =!= 98)
      .select(col("user_id"), col("session_id"), col("n_events"),
        graft.rel.Queries.rnd(col("sv"), 6).as("sv"))
    val batch = Streaming.sessionizeTransform((evs :+ late).toDF())
    assert(collectSet(streamed) === collectSet(batch))
  }

  test("fMGWS sessionizer: below-watermark late events are dropped, never inflate the open session") {
    // Spark (≥3.4, SPARK-40025) filters below-watermark rows before
    // flatMapGroupsWithState, and with watermark delay (10 min) < gap
    // (30 min) any SURVIVING event is within the gap of the open
    // session's lastMs by arithmetic — so an hours-late event must
    // simply vanish, leaving the open session's count intact. (The
    // in-code very-late branch guards the delay > gap configuration.)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streaming.sessionizeCustomState(mem.toDF())
      .writeStream.format("memory").queryName("sess_late").outputMode("append").start()
    try {
      mem.addData(
        Ev(1, ts("2024-01-01 12:00:00"), 5, "click", 1.0),
        Ev(2, ts("2024-01-01 12:10:00"), 5, "click", 2.0),
        Ev(3, ts("2024-01-01 12:30:00"), 50, "view", 0.0))
      q.processAllAvailable()
      mem.addData(Ev(4, ts("2024-01-01 08:00:00"), 5, "click", 7.0)) // below watermark
      q.processAllAvailable()
      mem.addData(Ev(5, ts("2024-01-01 20:00:00"), 51, "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_late").filter(col("user_id") === 5)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === Set((1L, 2L, 3.0)), "open session unpolluted; late row dropped")
  }

  test("EWMA state stream ≡ ewmaEventsScan across multi-batch in-order feeds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streaming.ewmaStream(mem.toDF())
      .writeStream.format("memory").queryName("ewma_s").outputMode("append").start()
    try {
      // three triggers, in-order ACROSS triggers per type (the
      // contract); within trigger 2 the two clicks arrive ts-SHUFFLED —
      // the fold must repair the order before folding
      mem.addData(evs(0))
      q.processAllAvailable()
      mem.addData(evs(3), evs(1)) // clicks: 11:10 arrives before 10:20
      q.processAllAvailable()
      mem.addData(evs(2), evs(4))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = collectSet(spark.table("ewma_s"))
    val batch = collectSet(
      graft.rel.TimeSeries.ewmaEventsScan(evs.toDF()))
    assert(streamed === batch)
    // recurrence sanity on the click chain (values 1, 2, 4):
    // e = 1, 0.3·2+0.7·1 = 1.3, 0.3·4+0.7·1.3 = 2.11
    val clicks = spark.table("ewma_s").filter(col("event_type") === "click")
      .orderBy("event_id").select("ewma").as[Double].collect().toSeq
    assert(clicks === Seq(1.0, 1.3, 2.11))
  }

  test("stream_topk twin: foreachBatch rank over sealed windows ≡ batch top-k") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = scala.collection.mutable.Set.empty[Seq[Any]]
    val rank: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (b, _) => {
        val rows = Streaming.rankSealed(b).collect()
        out.synchronized { rows.foreach(r => out += r.toSeq) }
      }
    val q = Streaming.tumblingStream(mem.toDF())
      .writeStream.outputMode("append").foreachBatch(rank).start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
      // sentinel far in the future seals the 13:00 window; its own
      // window stays open and must NOT appear in the output
      mem.addData(Ev(8, ts("2024-01-01 23:00:00"), 3, "view", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val batch = collectSet(Streaming.rankSealed(Streaming.tumblingTransform(evs.toDF())))
    assert(out.toSet === batch)
    assert(batch.nonEmpty)
  }

  test("session_window streaming twin ≡ batch lag/flag sessionize (session multisets)") {
    import spark.implicits._
    // session boundaries: user 1 → {10:05,10:20} + {11:10} (50-min gap);
    // user 2 → {10:40} + {13:00}.
    val static = evs.toDF()
    val viaSessionWindow = Streaming.sessionizeStream(static)
      .select("user_id", "n_events", "sv")
    // batch formulation needs the events-table shape; feed it directly:
    val viaLag = {
      val s2 = spark
      import org.apache.spark.sql.expressions.Window
      val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      static
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(order))
        .withColumn("new_s", when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("new_s")).over(run))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          graft.rel.Queries.rnd(sum("value"), 6).as("sv"))
        .select("user_id", "n_events", "sv")
    }
    assert(collectSet(viaSessionWindow) === collectSet(viaLag))
  }

  test("stream-static enrich (complete mode) ≡ batch enrich on same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cust = Seq((2L, "AUTO"), (3L, "HOUSE")) // user_id = c_custkey - 1 → users 1, 2
      .toDF("c_custkey", "c_mktsegment")
    val mem = MemoryStream[Ev]
    mem.addData(evs: _*)
    val q = Streaming.enrichTransform(mem.toDF(), cust)
      .writeStream.format("memory").queryName("enrich").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    assert(collectSet(spark.table("enrich")) ===
      collectSet(Streaming.enrichTransform(evs.toDF(), cust)))
    assert(spark.table("enrich").count() > 0, "vacuous twin: dimension never matched")
  }

  test("stream-stream interval join (append mode) ≡ batch click→purchase join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val joinEvs = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 0),
      Ev(2, ts("2024-01-01 10:10:00"), 1, "purchase", 0), // e1 +10min: match
      Ev(3, ts("2024-01-01 10:40:00"), 1, "purchase", 0), // e1 +40min: out; e4 +20min: match
      Ev(4, ts("2024-01-01 10:20:00"), 1, "click", 0),
      Ev(5, ts("2024-01-01 10:00:00"), 2, "click", 0),
      Ev(6, ts("2024-01-01 11:00:00"), 2, "purchase", 0)) // +60min: out
    val mem = MemoryStream[Ev]
    mem.addData(joinEvs: _*)
    val src = mem.toDF()
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    val q = Streaming.clickPurchaseStream(clicks, purchases)
      .writeStream.format("memory").queryName("cp_join").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = collectSet(spark.table("cp_join"))
    val batch = collectSet(Streaming.clickPurchaseTransform(joinEvs.toDF()))
    assert(streamed === batch)
    assert(batch == Set(Seq(1L, 1L, 2L), Seq(1L, 4L, 3L)), "hand-checked matches")
  }

  test("rolling z-score stream ≡ batch anomalyZscore across multi-batch in-order feeds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 24 alternating baseline points then a spike, split across two
    // triggers mid-history — the ring buffer must carry over
    val series = (1 to 24).map(i =>
      Ev(i.toLong, new Timestamp(i * 60000L), 1, "click", if (i % 2 == 0) 12.0 else 10.0)) :+
      Ev(99L, new Timestamp(25 * 60000L), 1, "click", 100.0)
    val mem = MemoryStream[Ev]
    val q = Streaming.anomalyStream(mem.toDF())
      .writeStream.format("memory").queryName("anom_s").outputMode("append").start()
    try {
      mem.addData(series.take(10): _*); q.processAllAvailable()
      mem.addData(series.drop(10): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = collectSet(spark.table("anom_s"))
    val batch = collectSet(graft.rel.TimeSeries.anomalyZscore(series.toDF()
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))))
    assert(streamed === batch)
    assert(spark.table("anom_s").select("event_id").as[Long].collect().toSeq === Seq(99L))
  }

  test("rolling z-score stream contract: order WITHIN a trigger is repaired, across triggers is not") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val series = (1 to 24).map(i =>
      Ev(i.toLong, new Timestamp(i * 60000L), 1, "click", if (i % 2 == 0) 12.0 else 10.0)) :+
      Ev(99L, new Timestamp(25 * 60000L), 1, "click", 100.0)
    // whole feed delivered SHUFFLED in one trigger: the per-group sort
    // repairs it — same alert as the ordered feed
    val mem1 = MemoryStream[Ev]
    val q1 = Streaming.anomalyStream(mem1.toDF())
      .writeStream.format("memory").queryName("anom_shuf").outputMode("append").start()
    try { mem1.addData(scala.util.Random.shuffle(series): _*); q1.processAllAvailable() }
    finally q1.stop()
    assert(spark.table("anom_shuf").select("event_id").as[Long].collect().toSeq === Seq(99L))
    // spike delivered in an EARLIER trigger than its history: state knows
    // nothing yet, so the spike is unscored — the documented in-order
    // contract across triggers (same as dedupStream's first-arrived rule)
    val mem2 = MemoryStream[Ev]
    val q2 = Streaming.anomalyStream(mem2.toDF())
      .writeStream.format("memory").queryName("anom_ooo").outputMode("append").start()
    try {
      mem2.addData(series.last); q2.processAllAvailable()
      mem2.addData(series.dropRight(1): _*); q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.table("anom_ooo").count() === 0)
  }

  test("keep-latest CDC stream ≡ batch cdcLatest across multi-batch feeds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streaming.latestStream(mem.toDF())
      .writeStream.format("memory").queryName("cdc_s").outputMode("update").start()
    // batch 2 updates user 1 (newer ts) and delivers an out-of-order OLDER
    // event for user 2 — the state must keep user 2's batch-1 version
    val b2 = Seq(
      Ev(6, ts("2024-01-01 14:00:00"), 1, "error", 9.0),
      Ev(7, ts("2024-01-01 09:00:00"), 2, "view", 0.5))
    try {
      mem.addData(evs: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // every emission is the key's running latest, so the final state is
    // the emission with the newest underlying event — recover it by
    // joining emissions against the batch compaction and asserting the
    // batch answer was emitted AND no emission is newer than it
    val batch = graft.rel.TimeSeries.cdcLatest((evs ++ b2).toDF())
    val emitted = spark.table("cdc_s")
      .select("user_id", "event_id", "event_type", "value")
      .distinct() // a state echoed across triggers emits the same row twice
    assert(batch.join(emitted,
      Seq("user_id", "event_id", "event_type", "value")).count() === batch.count())
    // the out-of-order batch-2 event for user 2 was never surfaced as latest
    assert(emitted.filter(col("user_id") === 2 && col("event_id") === 7).count() === 0)
    // user 2's only emitted version is the batch-1 event 5
    assert(emitted.filter(col("user_id") === 2).select("event_id")
      .distinct().as[Long].collect().toSeq === Seq(5L))
  }

  test("OHLC bar stream (complete mode) ≡ batch ohlcHourly — min_by/max_by in streaming agg") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = graft.rel.TimeSeries.ohlcHourly(mem.toDF())
      .writeStream.format("memory").queryName("ohlc_s").outputMode("complete").start()
    try {
      mem.addData(evs: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(collectSet(spark.table("ohlc_s")) ===
      collectSet(graft.rel.TimeSeries.ohlcHourly(evs.toDF())))
  }

  test("events_funnel stages are the hand-checked sequence mins") {
    import spark.implicits._
    val fEvs = Seq(
      // u1 completes: signup 10:00 → click 10:05 → purchase 10:10
      Ev(1, ts("2024-01-01 10:00:00"), 1, "signup", 0),
      Ev(2, ts("2024-01-01 10:05:00"), 1, "click", 0),
      Ev(3, ts("2024-01-01 10:10:00"), 1, "purchase", 0),
      // u2 stalls at stage 2: purchase PRECEDES the click
      Ev(4, ts("2024-01-01 09:00:00"), 2, "signup", 0),
      Ev(5, ts("2024-01-01 09:30:00"), 2, "purchase", 0),
      Ev(6, ts("2024-01-01 09:40:00"), 2, "click", 0),
      // u3 never signs up → not in the funnel at all
      Ev(7, ts("2024-01-01 08:00:00"), 3, "click", 0),
      // u4 stage 1: click happened BEFORE signup
      Ev(8, ts("2024-01-01 07:30:00"), 4, "click", 0),
      Ev(9, ts("2024-01-01 07:45:00"), 4, "signup", 0))
    val got = Streaming.funnelTransform(fEvs.toDF())
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(got == Map(1L -> 3, 2L -> 2, 4L -> 1))
  }

  test("unique-users stream (append + watermark) ≡ batch transform on same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streaming.uniqueUsersStream(mem.toDF())
      .writeStream.format("memory").queryName("uu").outputMode("append").start()
    try {
      // duplicate user 1 inside hour 10 must count once; the 13:00 row
      // advances the watermark past hours 10/11 so they emit
      mem.addData(evs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("uu")
      .select("ws", "unique_users").as[(Long, Long)].collect().toMap
    val batch = Streaming.uniqueUsersTransform(evs.toDF())
      .select("ws", "unique_users").as[(Long, Long)].collect().toMap
    // emitted (closed) windows must agree with the batch answer
    streamed.foreach { case (ws, n) => assert(batch(ws) === n, s"window $ws") }
    val h10 = ts("2024-01-01 10:00:00").getTime / 1000
    assert(streamed(h10) === 2L, "dup user within the hour counted once")
  }

  test("horizon dedup stream (window-keyed, evictable state) ≡ batch per-hour first-event dedup") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1 clicks twice in hour 10 (dup within horizon — second drops)
    // and once in hour 11 (NEW horizon — kept, unlike stream_dedup's
    // forever-dedup which would drop it)
    val mem = MemoryStream[Ev]
    mem.addData(evs: _*)
    val q = Streaming.dedupHorizonStream(mem.toDF())
      .writeStream.format("memory").queryName("ddh").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = collectSet(spark.table("ddh"))
    val batch = collectSet(Streaming.dedupHorizonTransform(evs.toDF()))
    assert(streamed === batch)
    // the semantic split vs forever-dedup: hour-11 click IS in horizon
    // output, NOT in stream_dedup's
    val h11 = ts("2024-01-01 11:00:00").getTime / 1000
    assert(spark.table("ddh").filter(col("ws") === h11 && col("event_id") === 4).count() === 1)
    assert(Streaming.dedupFirstTransform(evs.toDF())
      .filter(col("event_id") === 4).count() === 0)
  }

  test("dropDuplicatesWithinWatermark: sliding-horizon dedup drops in-delay dups across hour boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 10:50 and 11:05 straddle the hour boundary: the WINDOW-keyed form
    // keeps both (different hours); the sliding form drops the second
    // (within 1 h of first-seen). Eviction lags ONE BATCH behind event
    // time — the watermark only advances at batch end, so e3 (13:00)
    // still meets live state (watermark 10:05 < expiry 11:50) and is
    // dropped; e4 in the NEXT batch sees the advanced watermark
    // (12:00 > 11:50, state evicted) and is re-admitted. Exactly the
    // operational surprise this pin documents.
    val feed = Seq(
      Ev(1, ts("2024-01-01 10:50:00"), 7, "click", 1.0),
      Ev(2, ts("2024-01-01 11:05:00"), 7, "click", 2.0),
      Ev(3, ts("2024-01-01 13:00:00"), 7, "click", 3.0),
      Ev(4, ts("2024-01-01 13:30:00"), 7, "click", 4.0))
    val mem = MemoryStream[Ev]
    val q = Streaming.dedupSlidingHorizonStream(mem.toDF())
      .writeStream.format("memory").queryName("ddw").outputMode("append").start()
    try {
      mem.addData(feed.take(2): _*); q.processAllAvailable()
      mem.addData(feed(2)); q.processAllAvailable()
      mem.addData(feed(3)); q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("ddw").select("event_id").as[Long].collect().toSet
    assert(ids === Set(1L, 4L),
      s"expected in-delay dup e2 AND watermark-lagged e3 dropped, e4 re-admitted; got $ids")
    // the window-keyed horizon form keeps BOTH boundary events
    val mem2 = MemoryStream[Ev]
    mem2.addData(feed: _*)
    val q2 = Streaming.dedupHorizonStream(mem2.toDF())
      .writeStream.format("memory").queryName("ddh2").outputMode("append").start()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.table("ddh2").select("event_id").as[Long].collect().toSet
      === Set(1L, 2L, 3L))
  }

  test("error-rate stream (append + watermark) ≡ batch errorRateHourly; planted late row dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val errEvs = Seq(
      Ev(1, ts("2024-01-01 10:05:00"), 1, "error", 1.0),
      Ev(2, ts("2024-01-01 10:20:00"), 1, "click", 2.0),
      Ev(3, ts("2024-01-01 10:40:00"), 2, "click", 3.0),
      Ev(4, ts("2024-01-01 11:10:00"), 1, "error", 4.0),
      Ev(5, ts("2024-01-01 13:00:00"), 2, "view", 5.0))
    val mem = MemoryStream[Ev]
    val q = Streaming.errorRateStream(mem.toDF())
      .writeStream.format("memory").queryName("errs").outputMode("append").start()
    try {
      // the 13:00 row advances the watermark to 12:00 → hours 10/11 close
      mem.addData(errEvs: _*)
      q.processAllAvailable()
      // planted LATE error in the already-closed hour 10: watermark-dropped,
      // must NOT mutate the already-emitted Wilson bound
      mem.addData(Ev(6, ts("2024-01-01 10:30:00"), 3, "error", 9.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("errs")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val batch = graft.rel.TimeSeries.errorRateHourly(errEvs.toDF())
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    // every emitted (closed) hour matches the batch Wilson row exactly
    streamed.foreach { case (h, row) => assert(batch(h) === row, s"hour $h") }
    val h10us = ts("2024-01-01 10:00:00").getTime * 1000L
    assert(streamed(h10us)._2 === 1L, "late error must not re-count into hour 10")
  }

  test("cusum state stream ≡ batch fixed-baseline form; alarm fires after the planted shift") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // baseline μ₀ = 10; hours 10-11 on-baseline, hours 12-14 shifted to 16
    // → S⁺ walks 0, 0, 6, 12, 18: alarm (threshold 10) from hour 13 on
    val series = Seq(
      Ev(1, ts("2024-01-01 10:05:00"), 1, "view", 10.0),
      Ev(2, ts("2024-01-01 11:05:00"), 1, "view", 10.0),
      Ev(3, ts("2024-01-01 12:05:00"), 1, "view", 16.0),
      Ev(4, ts("2024-01-01 13:05:00"), 1, "view", 16.0),
      Ev(5, ts("2024-01-01 14:05:00"), 1, "view", 16.0),
      Ev(6, ts("2024-01-01 15:00:00"), 1, "view", 999.0)) // closes hour 14
    val mu = Map("view" -> 10000000L)
    val mem = MemoryStream[Ev]
    val q = Streaming.cusumStream(mem.toDF(), mu)
      .writeStream.format("memory").queryName("cus").outputMode("append").start()
    try {
      // split mid-shift so open-hour state and S⁺ carry across triggers
      mem.addData(series.take(3): _*); q.processAllAvailable()
      mem.addData(series.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("cus")
      .select("event_type", "hs", "v", "cusum_pos", "alarm")
      .collect().map(_.toSeq).toSet
    val batch = graft.rel.TimeSeries.cusumFixedBaselineHourly(series.toDF()
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value")), mu)
      .filter(col("hs") < ts("2024-01-01 15:00:00").getTime / 1000) // open hour unemitted
      .select("event_type", "hs", "v", "cusum_pos", "alarm")
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    val alarms = spark.table("cus").filter(col("alarm"))
      .select("hs").as[Long].collect().toSet
    assert(alarms === Set(
      ts("2024-01-01 13:00:00").getTime / 1000,
      ts("2024-01-01 14:00:00").getTime / 1000))
  }

  test("hampel state stream ≡ batch detail on every emitted row; spike flags with 3h lookahead") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 12 steady hours at 10.0 with a spike (1000.0) at hour 15 — the
    // stream grades hour h when h+3 CLOSES (i.e. when hour h+4's first
    // event arrives), so the spike emits once hour 19's event lands
    val series = (0 until 12).map { h =>
      Ev(h.toLong, ts(f"2024-01-01 ${10 + h}%02d:05:00"), 1, "view",
        if (h == 5) 1000.0 else 10.0)
    }
    val mem = MemoryStream[Ev]
    val q = Streaming.hampelStream(mem.toDF())
      .writeStream.format("memory").queryName("hamp").outputMode("append").start()
    try {
      // split mid-window so the ring carries across triggers
      mem.addData(series.take(7): _*); q.processAllAvailable()
      mem.addData(series.drop(7): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("hamp")
      .select("event_type", "hs", "v", "med_v", "flag")
      .collect().map(_.toSeq).toSet
    val batchAll = graft.rel.TimeSeries.hampelDetail(series.toDF()
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value")))
      .select(col("event_type"), col("hs"), col("v"),
        graft.rel.Queries.rnd(col("med") / 1e6, 6).as("med_v"), col("flag"))
      .collect().map(_.toSeq)
    // closed hours are 10..20 (21 is still open); hour i emits once
    // three MORE hours have closed → rows 10..17 emit, 18..20 wait
    val horizon = ts("2024-01-01 18:00:00").getTime / 1000
    val batch = batchAll.filter(_(1).asInstanceOf[Long] < horizon).toSet
    assert(streamed === batch)
    assert(streamed.size === 8)
    // exactly the spike hour flags
    val flagged = spark.table("hamp").filter(col("flag"))
      .select("hs").as[Long].collect().toSet
    assert(flagged === Set(ts("2024-01-01 15:00:00").getTime / 1000))
  }

  test("drawdown state stream ≡ batch tsDrawdown on every closed hour across multi-batch feeds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // hourly means 10, 20 (new peak), 14 (drawdown 0.3), 16; the final
    // 14:00 row only closes hour 13 — it stays open and unemitted
    val series = Seq(
      Ev(1, ts("2024-01-01 10:05:00"), 1, "view", 8.0),
      Ev(2, ts("2024-01-01 10:25:00"), 1, "view", 12.0),
      Ev(3, ts("2024-01-01 11:10:00"), 1, "view", 20.0),
      Ev(4, ts("2024-01-01 12:15:00"), 1, "view", 14.0),
      Ev(5, ts("2024-01-01 13:05:00"), 1, "view", 16.0),
      Ev(6, ts("2024-01-01 14:00:00"), 1, "view", 999.0))
    val mem = MemoryStream[Ev]
    val q = Streaming.drawdownStream(mem.toDF())
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    try {
      // split mid-hour-12 so the open-hour state must carry across triggers
      mem.addData(series.take(3): _*); q.processAllAvailable()
      mem.addData(series.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dd")
      .select("event_type", "hs", "v", "peak_v", "drawdown")
      .collect().map(_.toSeq).toSet
    val batch = graft.rel.TimeSeries.tsDrawdown(series.toDF()
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value")))
      .filter(col("hs") < ts("2024-01-01 14:00:00").getTime / 1000) // open hour unemitted
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    // the planted shape: hour 12 is 30% below the hour-11 peak
    val dd12 = spark.table("dd")
      .filter(col("hs") === ts("2024-01-01 12:00:00").getTime / 1000)
      .select("drawdown").as[Double].head()
    assert(math.abs(dd12 - 0.3) < 1e-9)
  }

  test("drawdown stream ≡ batch when the all-time peak is exactly 0 (NULL, not NaN)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // zero/negative value series: hour-10 mean −5 (peak −5e6, drawdown 0),
    // hour-11 mean 0 (peak 0 → unguarded, the batch ANSI division THROWS
    // and the stream's JVM arithmetic yields NaN; both now emit NULL —
    // ADVICE r9)
    val series = Seq(
      Ev(1, ts("2024-01-01 10:05:00"), 1, "view", -5.0),
      Ev(2, ts("2024-01-01 11:10:00"), 1, "view", 0.0),
      Ev(3, ts("2024-01-01 12:00:00"), 1, "view", 999.0)) // closes hour 11
    val mem = MemoryStream[Ev]
    val q = Streaming.drawdownStream(mem.toDF())
      .writeStream.format("memory").queryName("ddz").outputMode("append").start()
    try { mem.addData(series: _*); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("ddz")
      .select("event_type", "hs", "v", "peak_v", "drawdown")
      .collect().map(_.toSeq).toSet
    val batch = graft.rel.TimeSeries.tsDrawdown(series.toDF()
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value")))
      .filter(col("hs") < ts("2024-01-01 12:00:00").getTime / 1000)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    val h11 = spark.table("ddz")
      .filter(col("hs") === ts("2024-01-01 11:00:00").getTime / 1000)
      .select("drawdown").collect().head
    assert(h11.isNullAt(0), "peak==0 hour must emit NULL drawdown, not NaN")
  }

  test("SLO burn stream (ring state) ≡ batch sloBurn on closed hours; blip does not page") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the batch spec's scenario: 11 quiet hours (1 error in 10), one
    // all-error hour, then a sentinel event that closes it
    val rows = (0 until 12).flatMap { h =>
      (0 until 10).map { i =>
        val typ = if (h == 11) "error" else if (i == 0) "error" else "view"
        Ev((h * 10 + i).toLong, new Timestamp(h * 3600000L), 1L, typ, 1.0)
      }
    } :+ Ev(999L, new Timestamp(12 * 3600000L), 1L, "view", 1.0)
    val mem = MemoryStream[Ev]
    val q = Streaming.sloBurnStream(mem.toDF())
      .writeStream.format("memory").queryName("slo").outputMode("append").start()
    try {
      // split mid-hour-6 so both the open hour AND the ring carry over
      mem.addData(rows.take(65): _*); q.processAllAvailable()
      mem.addData(rows.drop(65): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("slo").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toMap
    val batch = graft.rel.TimeSeries.sloBurn(rows.toDF()
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value")))
      .filter(col("hour_us") < 12L * 3600000000L) // open sentinel hour unemitted
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toMap
    assert(streamed === batch)
    // the bad hour trips the fast window but not the page (blip suppression)
    val bad = streamed(11L * 3600000000L)
    assert(math.abs(bad._3 - 4.0) < 1e-6 && !bad._5)
  }

  test("hourly-profile stream (update mode, 168-cell bounded state) ≡ batch cells") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streaming.hourlyProfileStream(mem.toDF())
      .writeStream.format("memory").queryName("prof").outputMode("complete").start()
    try {
      mem.addData(evs.take(3): _*); q.processAllAvailable()
      mem.addData(evs.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = collectSet(spark.table("prof"))
    val batch = collectSet(graft.rel.TimeSeries.hourlyProfileCells(evs.toDF()
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))))
    assert(streamed === batch)
    // the full read-out (share/avg) is a projection over these cells —
    // pin the batch row derives from exactly this frame
    val full = graft.rel.TimeSeries.eventsHourlyProfile(evs.toDF()
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value")))
    assert(full.count() === spark.table("prof").count())
  }
}
