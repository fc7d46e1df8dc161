package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Tables
import graft.rel.Queries.rnd

/** Row types for the custom-state sessionizer (top-level for stable
  * Encoder derivation). */
case class SessEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long, value: Double)
case class SessState(sessionId: Long, lastMs: Long, n: Long, sv: Double)
case class SessAgg(user_id: Long, session_id: Long, n_events: Long, sv: Double)

/** Row types for the rolling z-score stream (`Streaming.anomalyStream`). */
case class AnomEvent(event_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
case class AnomState(vals: Seq[Double])
case class AnomAlert(event_id: Long, event_type: String, value: Double, z: Double)

/** Row types for the EWMA state stream (`Streaming.ewmaStream`). */
case class EwmaEvent(event_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
case class EwmaState(e: Double)
case class EwmaOut(event_type: String, event_id: Long, ewma: Double)

/** Row types for the drawdown state stream (`Streaming.drawdownStream`). */
case class DdEvent(event_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
case class DdState(hs: Long, sum: Double, n: Long, peakE6: Long)
case class DdOut(event_type: String, hs: Long, v: Double, peak_v: Double,
  drawdown: Option[Double])

/** Row types for the SLO burn-rate stream (`Streaming.sloBurnStream`). */
case class SloEvent(event_id: Long, ts: java.sql.Timestamp, event_type: String)
case class SloState(hs: Long, n: Long, nErr: Long, ring: Seq[(Long, Long)])
case class SloOut(hour_us: Long, n: Long, n_err: Long,
    burn_1h: Double, burn_6h: Double, page: Boolean)

/** Row types for the CUSUM drift stream (`Streaming.cusumStream`). */
case class HampState(hs: Long, sum: Double, n: Long, ring: Seq[(Long, Long)])
case class HampOut(event_type: String, hs: Long, v: Double, med_v: Double,
    flag: Boolean)

case class CusumEvent(event_id: Long, ts: java.sql.Timestamp, event_type: String,
    value: Double)
case class CusumState(hs: Long, sum: Double, n: Long, sPlusE6: Long)
case class CusumOut(event_type: String, hs: Long, v: Double, cusum_pos: Double,
    alarm: Boolean)

/** Row types for the keep-latest CDC stream (`Streaming.latestStream`). */
case class CdcEvent(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)
case class CdcState(tsMs: Long, event_id: Long, event_type: String, value: Double)
case class CdcLatest(user_id: Long, event_id: Long, event_type: String, value: Double)

/** Streaming-shaped operators over `events` (SURVEY.md §2.9 rows #31-#32).
  *
  * Each operator has (a) a batch formulation — pure relational, DuckDB
  * oracle-checkable, what the driver gates on — and (b) a Structured
  * Streaming twin over the same transform, exercised with MemoryStream in
  * `StreamingSpec` (watermark/late-data behavior is streaming-runtime
  * semantics no batch oracle can replay, SURVEY §5.2 layer 4).
  *
  * Scale: both are single-shuffle keyed aggregations; the windowed/
  * sessionized streaming forms carry watermarks so their state stores
  * stay bounded (keyed-dedup state is bounded by key cardinality
  * instead — see `dedupStream`).
  */
object Streaming {

  // #31 — tumbling 1-hour window counts/sums per event_type. Window start
  // emitted as epoch seconds (cross-engine-stable integer key).
  def tumbling(s: SparkSession, d: String): DataFrame =
    tumblingTransform(Tables.events(s, d))

  /** Shared batch/stream transform: works on a static OR streaming frame. */
  def tumblingTransform(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), rnd(sum("value"), 6).as("sv"))
      .select(
        col("window.start").cast("long").as("ws"),
        col("event_type"), col("n"), col("sv"))

  /** Streaming twin of #31: same transform + 10-minute watermark. */
  def tumblingStream(events: DataFrame): DataFrame =
    tumblingTransform(events.withWatermark("ts", "10 minutes"))

  /** stream_unique_users — hourly unique visitors: the metric every
    * dashboard leads with, and the canonical exactly-once streaming
    * aggregation shape (dropDuplicates on the (window, user) key + a
    * plain count, NOT count(distinct …) — streaming doesn't support
    * distinct aggregates, so the dedup-then-count rewrite IS the
    * streaming-correct form, and it's also the better batch plan: the
    * dedup is a map-side-combining aggregate keyed on (hour, user),
    * where countDistinct holds per-group sets). Batch and stream run
    * the same transform; the streaming twin adds the watermark and is
    * exercised in StreamingSpec.
    */
  def uniqueUsersTransform(events: DataFrame): DataFrame =
    events
      .select(date_trunc("hour", col("ts")).cast("long").as("ws"), col("user_id"))
      .dropDuplicates("ws", "user_id")
      .groupBy(col("ws"))
      .agg(count(lit(1)).as("unique_users"))

  def uniqueUsers(s: SparkSession, d: String): DataFrame =
    uniqueUsersTransform(Tables.events(s, d))

  /** Streaming twin. The dedup key is the WINDOW column, not a derived
    * long: `window(ts, …)` on a watermarked column carries the
    * event-time metadata, so the state store evicts a (window, user)
    * entry once the watermark passes the window end — dedup state is
    * bounded by (in-flight windows)·(users/hour), not stream lifetime.
    * (Round-9 fix, ADVICE r8: the previous `ws`-long key carried no
    * event-time metadata, so dedup state was NEVER evicted — it grew
    * with hours×users forever while the comment claimed otherwise.)
    * Rows later than the 1 h watermark are dropped before they reach
    * the dedup — the documented at-scale trade.
    */
  def uniqueUsersStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .select(window(col("ts"), "1 hour").as("window"), col("user_id"))
      .dropDuplicates("window", "user_id")
      .groupBy(col("window"))
      .agg(count(lit(1)).as("unique_users"))
      .select(col("window.start").cast("long").as("ws"), col("unique_users"))

  /** stream_dedup_horizon — HORIZON-BOUNDED ingestion dedup (round 9):
    * one row per (hour, user, event_type), the earliest by
    * (ts, event_id) — the at-scale variant of `stream_dedup`'s
    * "first event EVER per key": event logs re-deliver within minutes,
    * not months, so deduping within a 1-hour horizon gives the same
    * cleaning with state that EXPIRES. Batch form is a window top-1
    * keyed by (hour, user, type) — the same map-side-combining shape
    * as `uniqueUsersTransform`'s dedup.
    */
  def dedupHorizonTransform(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ws"), col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(date_trunc("hour", col("ts")).cast("long").as("ws"),
        col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("ws"), col("user_id"), col("event_type"), col("event_id"))
  }

  def dedupHorizon(s: SparkSession, d: String): DataFrame =
    dedupHorizonTransform(Tables.events(s, d))

  /** Streaming twin: dedup keyed on the WINDOW column (the
    * `uniqueUsersStream` discipline — event-time metadata in the key,
    * so the state store evicts each (window, user, type) entry once
    * the watermark passes the window; state is in-flight-windows ×
    * keys/hour, never stream lifetime). Keeps the first-ARRIVED row =
    * first-by-ts on in-order sources (the `dedupStream` contract;
    * StreamingSpec pins ≡ batch on an ordered MemoryStream).
    */
  def dedupHorizonStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .select(window(col("ts"), "1 hour").as("window"),
        col("user_id"), col("event_type"), col("event_id"))
      .dropDuplicates("window", "user_id", "event_type")
      .select(col("window.start").cast("long").as("ws"),
        col("user_id"), col("event_type"), col("event_id"))

  /** The `dropDuplicatesWithinWatermark` form — dedup within a SLIDING
    * event-time horizon rather than aligned hour windows: a duplicate
    * arriving within the watermark delay of the first-seen row is
    * dropped, state expires once the watermark passes first-seen + δ.
    * DIFFERENT semantics from both `dedupStream` (forever) and
    * `dedupHorizonStream` (aligned windows) — two duplicates
    * straddling an hour BOUNDARY dedup here but not there; spec-pinned
    * behaviorally, not declared (no batch twin is exactly equivalent,
    * which is the point of documenting all three).
    */
  def dedupSlidingHorizonStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Streaming twin of `events_error_rate` (round-9, VERDICT r8 #6):
    * the hourly Wilson-bound error rate as a watermarked stream — a
    * real monitoring user runs this read-out as a stream FIRST and
    * backfills with the batch row. The counts aggregate keys on
    * `window(ts, "1 hour")` (event-time metadata → state evicted once
    * the watermark passes the window; rows later than 1 h are dropped,
    * never silently mutating an already-alerted hour), then the SAME
    * `wilsonBounds` projection as the batch row — one shared formula,
    * the `tumblingTransform` twin discipline. Append mode emits each
    * hour exactly once, on close: the shape an alert router wants.
    */
  def errorRateStream(events: DataFrame): DataFrame =
    graft.rel.TimeSeries.wilsonBounds(
      events
        .withWatermark("ts", "1 hour")
        .select(col("ts"),
          when(col("event_type") === "error", 1L).otherwise(0L).as("is_err"))
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), sum(col("is_err")).as("n_err"))
        .select(unix_micros(col("window.start")).as("hour_us"),
          col("n"), col("n_err")))

  /** Streaming twin of `events_hourly_profile`: the dow×hour traffic
    * heatmap continuously updated. NO watermark by design — the
    * profile accumulates ALL history, and its state is bounded by the
    * 168-cell key space (the `dedupStream` key-cardinality argument),
    * so eviction would be wrong and is not needed. Emits the raw
    * (dow, hour, n, svu) cells; `share`/`avg_value` are a projection
    * over the ≤ 168-row output, computed at the sink (a global share
    * inside the stream would force complete-mode recomputation of
    * every cell on every trigger for a value the read-out derives in
    * microseconds).
    */
  def hourlyProfileStream(events: DataFrame): DataFrame =
    graft.rel.TimeSeries.hourlyProfileCells(events)

  /** File-source streaming ingest: a DIRECTORY of events parquet files as
    * a stream (readStream → transform → writeStream; file sources watch
    * directories). Same nanos→µs handling as the batch loader; schema
    * pinned from one batch read (streaming sources require an explicit
    * schema). Handles both raw timestamp[ns] files (read as nanos-long)
    * and already-long ts columns.
    */
  def eventsFileStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = s.read.parquet(dir).schema
    val raw = s.readStream.schema(schema).parquet(dir)
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      // timestamp[us] parquet reads as TIMESTAMP_NTZ; normalize to
      // TIMESTAMP (value-preserving under the pinned UTC session tz) so
      // watermarks/windows behave identically to the batch loader
      case _ => raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  // stream_dedup — keyed first-event dedup: one row per (user_id,
  // event_type), the earliest by (ts, event_id). Batch form is a
  // deterministic window top-1; the streaming twin is Spark's
  // `dropDuplicates` + watermark (state-store dedup — keeps the
  // first-ARRIVED row, which equals first-by-ts for in-order sources;
  // StreamingSpec asserts the equivalence on an ordered MemoryStream).
  def dedupFirst(s: SparkSession, d: String): DataFrame =
    dedupFirstTransform(Tables.events(s, d))

  def dedupFirstTransform(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"))
  }

  /** Streaming twin of stream_dedup: state-store dedup. State here is one
    * row per DISTINCT (user_id, event_type) — bounded by key cardinality,
    * not stream length, but NOT evicted by the watermark (eviction only
    * applies when the event-time column is part of the dedup key; full
    * eviction would also break the "first event ever per key" semantics
    * this twin shares with the batch form). For dedup-within-horizon
    * semantics with hard state bounds, use
    * `dropDuplicatesWithinWatermark` instead — different semantics.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"), col("event_id"))

  /** Streaming twin of `TimeSeries.anomalyZscore`: per event_type the
    * state is the RING BUFFER of the last 24 values (by event time), so
    * each arriving event is scored against exactly the history the
    * batch window frame would give it. State size = 24 doubles × type
    * cardinality — hard-bounded, no watermark eviction needed
    * (`NoTimeout`). Within a trigger the group's events are sorted by
    * (ts, event_id) before folding; equality with the batch form
    * therefore holds for in-order sources (same contract as
    * `dedupStream`, asserted in StreamingSpec across multi-batch
    * feeds). The z rounding reuses the oracle formula so the twin is
    * bit-comparable to the batch query.
    */
  def anomalyStream(events: DataFrame): Dataset[AnomAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    val HistMax = 24
    def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    events
      .select(col("event_id"), col("ts"), col("event_type"),
        col("value").cast("double").as("value"))
      .as[AnomEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[AnomState, AnomAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (etype: String, evs: Iterator[AnomEvent], state: GroupState[AnomState]) =>
          var hist = state.getOption.map(_.vals).getOrElse(Seq.empty)
          val alerts = Seq.newBuilder[AnomAlert]
          evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val n = hist.length
            if (n >= 12) {
              val mu = hist.sum / n
              val sd = math.sqrt(hist.map(x => (x - mu) * (x - mu)).sum / (n - 1))
              if (sd > 0) {
                val z = (e.value - mu) / sd
                if (math.abs(z) > 2)
                  alerts += AnomAlert(e.event_id, etype, e.value, rnd6(z))
              }
            }
            hist = (hist :+ e.value).takeRight(HistMax)
          }
          state.update(AnomState(hist))
          alerts.result().iterator
      }
  }

  /** EWMA state stream — the recursive fold (e = α·v + (1−α)·e_prev)
    * as `flatMapGroupsWithState` with ONE DOUBLE of state per
    * event_type: the minimal-state end of the custom-state spectrum
    * (the z-score stream keeps a 24-value ring buffer; CDC keeps one
    * struct). Batch twin is `TimeSeries.ewmaEventsScan` — identical
    * factors via the same decimal strings, identical (ts, event_id)
    * fold order, so equality is bit-level for in-order sources:
    * within a trigger the group sorts by event time (order repaired),
    * across triggers history is arrival-order — the same contract as
    * `anomalyStream`/`dedupStream`, asserted in StreamingSpec across
    * multi-batch feeds. No watermark needed: state never grows.
    */
  def ewmaStream(events: DataFrame, alpha: Double = 0.3): Dataset[EwmaOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val a = BigDecimal(alpha.toString).toDouble
    val compl = (BigDecimal(1) - BigDecimal(alpha.toString)).toDouble
    def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    events
      .select(col("event_id"), col("ts"), col("event_type"),
        col("value").cast("double").as("value"))
      .as[EwmaEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (etype: String, evs: Iterator[EwmaEvent], state: GroupState[EwmaState]) =>
          var seeded = state.exists
          var e = state.getOption.map(_.e).getOrElse(0.0)
          val out = Seq.newBuilder[EwmaOut]
          evs.toSeq.sortBy(x => (x.ts.getTime, x.event_id)).foreach { ev =>
            e = if (!seeded) ev.value else a * ev.value + compl * e
            seeded = true
            out += EwmaOut(etype, ev.event_id, rnd6(e))
          }
          if (seeded) state.update(EwmaState(e))
          out.result().iterator
      }
  }

  /** Streaming twin of `TimeSeries.tsDrawdown` (round-9 — the third
    * alerting read-out VERDICT r8 named): per-type running all-time
    * peak of the HOURLY MEAN and each closed hour's fractional drop
    * from it, as a `flatMapGroupsWithState` scan. State per event_type
    * is (open hour, sum, count, peak-e6) — four numbers, bounded by
    * key cardinality like `latestStream` (the peak never expires by
    * definition of "all-time high", so no watermark eviction). An hour
    * EMITS WHEN IT CLOSES — the first event of a later hour finalizes
    * the mean, folds it into the peak, and emits the drawdown row; the
    * still-open hour stays in state (a monitoring stream alerts on
    * closed hours; the batch row is the backfill for the final open
    * one). Same in-order contract as `ewmaStream`/`anomalyStream`:
    * order is repaired WITHIN a trigger by the (ts, event_id) sort,
    * not across triggers. Integer e6 peak arithmetic matches the batch
    * row's exactly; StreamingSpec pins stream ≡ batch on every closed
    * hour across a multi-batch feed.
    */
  def drawdownStream(events: DataFrame): Dataset[DdOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    events
      .select(col("event_id"), col("ts"), col("event_type"),
        col("value").cast("double").as("value"))
      .as[DdEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[DdState, DdOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (etype: String, evs: Iterator[DdEvent], state: GroupState[DdState]) =>
          var st = state.getOption.getOrElse(DdState(Long.MinValue, 0.0, 0L, Long.MinValue))
          val out = Seq.newBuilder[DdOut]
          def closeHour(): Unit = if (st.n > 0) {
            val v = rnd6(st.sum / st.n)
            val vu = math.floor(v * 1e6 + 0.5).toLong
            val peak = math.max(st.peakE6, vu)
            // peak == 0 guard (ADVICE r9): the batch twin's Spark division
            // by zero yields NULL where JVM arithmetic would yield NaN —
            // emit None so stream ≡ batch holds on zero/negative series too
            val dd = if (peak == 0L) None else Some(rnd6((peak - vu) / peak.toDouble))
            out += DdOut(etype, st.hs, v, rnd6(peak / 1e6), dd)
            st = DdState(st.hs, 0.0, 0L, peak)
          }
          evs.toSeq.sortBy(x => (x.ts.getTime, x.event_id)).foreach { ev =>
            val hs = math.floorDiv(ev.ts.getTime, 3600000L) * 3600L
            if (hs != st.hs) { closeHour(); st = st.copy(hs = hs, sum = 0.0, n = 0L) }
            st = st.copy(sum = st.sum + ev.value, n = st.n + 1)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming twin of `TimeSeries.cusumFixedBaselineHourly` — the
    * ONLINE CUSUM drift pager, fifth member of the alerting family
    * (error rate, SLO burn, drawdown, unique users). State per
    * event_type is (open hour, sum, count, S⁺-e6) — four numbers,
    * bounded by key cardinality; the trained e6 baseline rides the
    * closure (a broadcast-sized map, the `cusumBaselineE6` output). An
    * hour EMITS WHEN IT CLOSES (the `drawdownStream` discipline), the
    * first event of a later hour folding the closed mean into
    * S⁺ = max(0, S⁺ + (v̄ − μ₀)) in exact BIGINT e6 — the same integers
    * as the batch form's prefix-minus-running-min closed form, so
    * StreamingSpec pins stream ≡ batch on every closed hour. In-order
    * contract as `ewmaStream`: repaired within a trigger by the
    * (ts, event_id) sort, not across triggers.
    */
  def cusumStream(events: DataFrame, baselineE6: Map[String, Long]): Dataset[CusumOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val threshold = graft.rel.TimeSeries.CusumThreshold.dropRight(2).toDouble
    def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    events
      .select(col("event_id"), col("ts"), col("event_type"),
        col("value").cast("double").as("value"))
      .as[CusumEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (etype: String, evs: Iterator[CusumEvent], state: GroupState[CusumState]) =>
          val mu = baselineE6.getOrElse(etype, 0L)
          var st = state.getOption.getOrElse(CusumState(Long.MinValue, 0.0, 0L, 0L))
          val out = Seq.newBuilder[CusumOut]
          def closeHour(): Unit = if (st.n > 0) {
            val v = rnd6(st.sum / st.n)
            val vu = math.floor(v * 1e6 + 0.5).toLong
            val sPlus = math.max(0L, st.sPlusE6 + (vu - mu))
            val pos = rnd6(sPlus / 1e6)
            out += CusumOut(etype, st.hs, v, pos, pos > threshold)
            st = CusumState(st.hs, 0.0, 0L, sPlus)
          }
          evs.toSeq.sortBy(x => (x.ts.getTime, x.event_id)).foreach { ev =>
            val hs = math.floorDiv(ev.ts.getTime, 3600000L) * 3600L
            if (hs != st.hs) { closeHour(); st = st.copy(hs = hs, sum = 0.0, n = 0L) }
            st = st.copy(sum = st.sum + ev.value, n = st.n + 1)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming twin of `TimeSeries.hampelDetail` (round 10): the
    * rolling-median spike filter as a per-type
    * `flatMapGroupsWithState` scan. The batch window is ±3 OBSERVED
    * hours, so the stream necessarily emits WITH 3-HOUR LOOKAHEAD
    * DELAY: a closed hour is graded once three more hours close after
    * it (state = the open hour's (sum, n) plus a ≤ 7-entry ring of
    * closed (hs, vu) — constant per type). The ring IS the batch
    * window: once 4+ rows are closed, the 4th-from-last ring entry is
    * exactly the row whose ±3 row-frame the ring holds (leading edge
    * included — batch row i < 3 windows over rows 0..i+3, which is
    * the whole ring at that point). Medians are the same discrete
    * lower-median picks on the same e6 integers, so StreamingSpec
    * pins stream ≡ batch on every emitted row and that emitted =
    * all-but-the-last-3 closed hours per type. The last 3 rows of a
    * finite replay never emit — in production the stream is unbounded
    * and every hour eventually grades.
    */
  def hampelStream(events: DataFrame, k: Double = 3.0): Dataset[HampOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted; s((s.length - 1) / 2)
    }
    events
      .select(col("event_id"), col("ts"), col("event_type"),
        col("value").cast("double").as("value"))
      .as[DdEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[HampState, HampOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (etype: String, evs: Iterator[DdEvent], state: GroupState[HampState]) =>
          var st = state.getOption.getOrElse(
            HampState(Long.MinValue, 0.0, 0L, Seq.empty))
          val out = Seq.newBuilder[HampOut]
          def closeHour(): Unit = if (st.n > 0) {
            val v = rnd6(st.sum / st.n)
            val vu = math.floor(v * 1e6 + 0.5).toLong
            val ring = (st.ring :+ (st.hs, vu)).takeRight(7)
            if (ring.length >= 4) {
              val (chs, cvu) = ring(ring.length - 4)
              val win = ring.map(_._2)
              val med = lowerMedian(win)
              val mad = lowerMedian(win.map(x => math.abs(x - med)))
              val flag = math.abs(cvu - med) > k * 1.4826 * mad
              out += HampOut(etype, chs, rnd6(cvu / 1e6), rnd6(med / 1e6), flag)
            }
            st = st.copy(ring = ring, sum = 0.0, n = 0L)
          }
          evs.toSeq.sortBy(x => (x.ts.getTime, x.event_id)).foreach { ev =>
            val hs = math.floorDiv(ev.ts.getTime, 3600000L) * 3600L
            if (hs != st.hs) { closeHour(); st = st.copy(hs = hs, sum = 0.0, n = 0L) }
            st = st.copy(sum = st.sum + ev.value, n = st.n + 1)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming twin of `TimeSeries.sloBurn` (round 9): the two-window
    * burn-rate pager as a single-group `flatMapGroupsWithState` scan —
    * the form the alert router actually subscribes to. State is the
    * open hour's (n, n_err) plus a ≤ 5-entry ring of the last closed
    * hours' counts (the 6 h window's tail) — a dozen longs total,
    * constant regardless of stream length. An hour emits when it
    * CLOSES (the `drawdownStream` discipline — a burn alert on a
    * half-elapsed hour would page on partial denominators); the burn
    * arithmetic is the batch row's exact expression over the same
    * integer counts, so StreamingSpec pins stream ≡ batch on every
    * closed hour. Single global group by design: the hourly totals ARE
    * global (one state entry, trivially partitionable by service key
    * if a `ws` column is added — the `tumblingTransform` shape).
    */
  def sloBurnStream(events: DataFrame): Dataset[SloOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val slo = graft.rel.TimeSeries.SloTarget.dropRight(2).toDouble
    val fast = graft.rel.TimeSeries.BurnFast.dropRight(2).toDouble
    val slow = graft.rel.TimeSeries.BurnSlow.dropRight(2).toDouble
    def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    events
      .select(col("event_id"), col("ts"), col("event_type"))
      .as[SloEvent]
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[SloState, SloOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, evs: Iterator[SloEvent], state: GroupState[SloState]) =>
          var st = state.getOption.getOrElse(SloState(Long.MinValue, 0L, 0L, Nil))
          val out = Seq.newBuilder[SloOut]
          def closeHour(): Unit = if (st.n > 0) {
            val tail = st.ring.takeRight(5)
            val n6 = tail.map(_._1).sum + st.n
            val e6 = tail.map(_._2).sum + st.nErr
            val burn1 = (st.nErr.toDouble / st.n) / (1.0 - slo)
            val burn6 = (e6.toDouble / n6) / (1.0 - slo)
            out += SloOut(st.hs * 1000000L, st.n, st.nErr,
              rnd6(burn1), rnd6(burn6), burn1 > fast && burn6 > slow)
            st = SloState(st.hs, 0L, 0L, (tail :+ (st.n, st.nErr)).takeRight(5))
          }
          evs.toSeq.sortBy(x => (x.ts.getTime, x.event_id)).foreach { ev =>
            val hs = math.floorDiv(ev.ts.getTime, 3600000L) * 3600L
            if (hs != st.hs) { closeHour(); st = st.copy(hs = hs, n = 0L, nErr = 0L) }
            st = st.copy(n = st.n + 1,
              nErr = st.nErr + (if (ev.event_type == "error") 1L else 0L))
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming twin of `TimeSeries.cdcLatest`: keep-latest-version
    * state per user via `mapGroupsWithState`, emitting the key's
    * running latest on every trigger that touches it (Update mode —
    * the memory/console row stream is the CDC "current value" feed; a
    * sink doing point upserts applies rows as-is). State is ONE
    * max-struct per key — bounded by key cardinality exactly like the
    * batch aggregate's partial state, and like `dedupStream` it is
    * deliberately not watermark-evicted: "current version per key"
    * semantics never expire. The in-batch fold is max by (tsMs,
    * event_id) — order-independent, so arrival order within a trigger
    * cannot change the result (StreamingSpec asserts stream ≡ batch
    * compaction across multi-batch feeds).
    */
  def latestStream(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[CdcEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[CdcState, CdcLatest](GroupStateTimeout.NoTimeout) {
        (uid, evs, state) =>
          val incoming = evs.map(e => CdcState(e.ts.getTime, e.event_id, e.event_type, e.value))
            .maxBy(st => (st.tsMs, st.event_id))
          val best = state.getOption match {
            case Some(cur) if cur.tsMs > incoming.tsMs ||
              (cur.tsMs == incoming.tsMs && cur.event_id > incoming.event_id) => cur
            case _ => incoming
          }
          state.update(best)
          CdcLatest(uid, best.event_id, best.event_type, best.value)
      }
      .toDF()
  }

  // #32 — sessionization: per user, a new session opens when the gap to
  // the previous event exceeds 30 minutes. Batch form = lag/flag/running-
  // sum windows (pure SQL, oracle-checkable).
  def sessionize(s: SparkSession, d: String): DataFrame =
    sessionizeTransform(Tables.events(s, d))

  def sessionizeTransform(events: DataFrame): DataFrame = {
    val order = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(order))
      .withColumn(
        "new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), rnd(sum("value"), 6).as("sv"))
  }

  /** Streaming twin of #32: Spark's native `session_window` (gap-merge
    * state machine) + watermark. Same session boundaries as the batch
    * lag/flag formulation for strictly-increasing event times
    * (StreamingSpec asserts equal session row multisets).
    */
  def sessionizeStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), rnd(sum("value"), 6).as("sv"))
      .select(col("user_id"), col("n_events"), col("sv"))

  /** Custom-state sessionizer via `flatMapGroupsWithState` — the
    * §7.3 "custom session logic" tier that `session_window` can't express
    * (here it reimplements the same 30-min gap rule so StreamingSpec can
    * assert it against the batch window formulation; a production variant
    * would carry arbitrary per-session state). Per-user state machine:
    * events folded in (ts, event_id) order; an in-batch gap > 30 min
    * closes and emits the open session; the surviving open session parks
    * in the state store with an event-time timeout at last_ts + gap, and
    * is emitted when the watermark passes it. In BATCH execution (same
    * code path, Spark runs the function once per group with no timeouts)
    * the final session is emitted immediately.
    */
  def sessionizeCustomState(events: DataFrame): Dataset[SessAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    val streaming = events.isStreaming
    val GapMs = 1800000L
    val ds = (if (streaming) events.withWatermark("ts", "10 minutes") else events)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("value").cast("double").as("value"))
      .as[SessEvent]
    // State encoding: n > 0 = an OPEN session; n == 0 = a closed-marker
    // that only preserves the per-user session counter (so session ids
    // stay unique and aligned with the batch numbering after a timeout
    // emission — removing the state entirely would restart ids at 1).
    // Markers carry a TTL timeout (MarkerTtlMs) and are then removed, so
    // total state = open sessions + recently-active users' counters —
    // bounded; a user returning after the TTL restarts numbering at 1
    // (documented tradeoff).
    val MarkerTtlMs = 24L * 3600 * 1000
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessAgg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            if (s.n > 0) {
              state.update(s.copy(n = 0L, sv = 0.0))
              // clamp like the non-timeout site below: if the watermark
              // jumped more than the TTL past lastMs in one batch (idle
              // stream, then a far-future event), an unclamped timestamp
              // is ≤ watermark and setTimeoutTimestamp throws
              state.setTimeoutTimestamp(
                math.max(s.lastMs + MarkerTtlMs, state.getCurrentWatermarkMs() + 1))
              Iterator.single(SessAgg(user, s.sessionId, s.n, s.sv))
            } else {
              state.remove() // marker TTL expired
              Iterator.empty
            }
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[SessAgg]
            var cur = state.getOption
            sorted.foreach { e =>
              val ms = e.ts.getTime
              cur = cur match {
                case Some(s) if s.n > 0 && ms >= s.lastMs - GapMs && ms - s.lastMs <= GapMs =>
                  // max() guards cross-batch late events: an out-of-order
                  // row joins the session without dragging lastMs (and
                  // the next timeout) backwards
                  Some(s.copy(lastMs = math.max(s.lastMs, ms), n = s.n + 1, sv = s.sv + e.value))
                case Some(s) if s.n > 0 && ms < s.lastMs - GapMs =>
                  // out-of-contract VERY-late event (predates the open
                  // session by more than the gap): emit it as its own
                  // earlier-numbered singleton instead of silently
                  // inflating the open session; the open session moves to
                  // the next id (nothing with its old id was emitted yet)
                  out += SessAgg(user, s.sessionId, 1L, e.value)
                  Some(s.copy(sessionId = s.sessionId + 1))
                case Some(s) if s.n > 0 =>
                  out += SessAgg(user, s.sessionId, s.n, s.sv)
                  Some(SessState(s.sessionId + 1, ms, 1L, e.value))
                case Some(closed) =>
                  Some(SessState(closed.sessionId + 1, ms, 1L, e.value))
                case None =>
                  Some(SessState(1L, ms, 1L, e.value))
              }
            }
            cur.foreach { s =>
              if (streaming) {
                state.update(s)
                if (s.n > 0) {
                  // a late event can put lastMs+gap at/behind the current
                  // watermark, which setTimeoutTimestamp rejects — clamp
                  // just past it (the session then times out next batch)
                  val wm = state.getCurrentWatermarkMs()
                  state.setTimeoutTimestamp(math.max(s.lastMs + GapMs, wm + 1))
                }
              } else out += SessAgg(user, s.sessionId, s.n, s.sv)
            }
            out.iterator
          }
      }
  }

  // stream_topk — windowed top-k analytics: the 2 most frequent event
  // types per tumbling hour (tie-break: count DESC, type ASC). The
  // ranking window partitions by the (closed) time window — in a
  // streaming deployment this runs downstream of the watermarked
  // tumbling aggregate, ranking only windows the watermark has sealed.
  def topkPerWindow(s: SparkSession, d: String): DataFrame =
    rankSealed(tumblingTransform(Tables.events(s, d)))

  /** The rank step of stream_topk, factored so the streaming twin can
    * apply it per micro-batch. In a streaming deployment this runs in
    * `foreachBatch` downstream of the WATERMARKED tumbling aggregate in
    * Append mode: the aggregate emits a window's rows exactly once —
    * when the watermark passes the window end — so every window arrives
    * COMPLETE within a single batch and the per-batch rank is the final
    * rank for that window (StreamingSpec asserts stream ≡ batch). No
    * state beyond the upstream aggregate's own bounded store.
    */
  def rankSealed(agg: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ws")).orderBy(col("n").desc, col("event_type"))
    agg.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("ws"), col("event_type"), col("n"), col("rn"))
  }

  // #31b — sliding (hopping) windows: 1-hour window, 30-minute hop.
  // Duration = 2× hop ⇒ every event lands in exactly two windows, so the
  // oracle is a clean 2-row expansion per event (no containment filter).
  def sliding(s: SparkSession, d: String): DataFrame =
    slidingTransform(Tables.events(s, d))

  def slidingTransform(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), rnd(sum("value"), 6).as("sv"))
      .select(
        col("window.start").cast("long").as("ws"),
        col("event_type"), col("n"), col("sv"))

  // stream_enrich — stream-static dimension join: events enriched with
  // the customer dimension (user_id ↔ c_custkey - 1 in the synthetic
  // data), aggregated per (segment, event_type). The dimension side is
  // explicitly broadcast — it is a true dimension at any corpus scale,
  // and in the streaming deployment the static side is broadcast to
  // every micro-batch with no state store at all.
  def enrich(s: SparkSession, d: String): DataFrame =
    enrichTransform(Tables.events(s, d), Tables.customer(s, d))

  def enrichTransform(events: DataFrame, customer: DataFrame): DataFrame =
    events
      .join(broadcast(customer.select((col("c_custkey") - 1).as("user_id"),
        col("c_mktsegment"))), Seq("user_id"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), rnd(sum("value"), 6).as("sv"))
      .select(col("c_mktsegment").as("segment"), col("event_type"), col("n"), col("sv"))

  // stream_join — stream-stream interval join: each click matched with
  // the same user's purchases within the following 30 minutes. Batch
  // form is an equi-join on user_id with the interval as a post-join
  // filter (shuffle keyed on user; per-key fanout bounded by per-user
  // activity inside the window). The streaming twin gives BOTH sides a
  // watermark and bounds the join condition in event time, so each
  // side's join state evicts once the watermark passes cts + 30 min.
  def clickPurchase(s: SparkSession, d: String): DataFrame =
    clickPurchaseTransform(Tables.events(s, d))

  def clickPurchaseTransform(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    clicks.join(purchases, Seq("user_id"))
      .filter(col("pts") > col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"))
  }

  /** Streaming twin of stream_join: watermarks on both sides + an
    * event-time-bounded condition (required for state eviction in
    * stream-stream joins; without the bound state grows forever).
    */
  def clickPurchaseStream(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("cts", "1 hour")
    // rename the purchase-side key: both sides usually derive from ONE
    // source stream, and a same-exprId join key would trip Spark's
    // ambiguous-self-join detection
    val p = purchases.withColumnRenamed("user_id", "p_uid")
      .withWatermark("pts", "1 hour")
    c.join(p,
      col("user_id") === col("p_uid") &&
        col("pts") > col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"))
  }

  // events_funnel — staged conversion funnel over the sealed event
  // history: per user, first signup, then first click AFTER it, then
  // first purchase after THAT; stage = how far the user got. Three
  // keyed min-aggregations, every join keyed on user_id — one shuffle
  // key throughout, so co-partitioning is reused across all stages.
  def funnel(s: SparkSession, d: String): DataFrame =
    funnelTransform(Tables.events(s, d))

  def funnelTransform(events: DataFrame): DataFrame = {
    val us = unix_micros(col("ts"))
    val s1 = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(us).as("t1"))
    val s2 = events.filter(col("event_type") === "click")
      .join(s1, Seq("user_id")).filter(us > col("t1"))
      .groupBy(col("user_id")).agg(min(us).as("t2"))
    val s3 = events.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id")).filter(us > col("t2"))
      .groupBy(col("user_id")).agg(min(us).as("t3"))
    s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
      .select(col("user_id"), col("t1"), col("t2"), col("t3"),
        (lit(1) + when(col("t2").isNotNull, 1).otherwise(0)
          + when(col("t3").isNotNull, 1).otherwise(0)).as("stage"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling" -> tumbling,
    "stream_unique_users" -> uniqueUsers,
    "stream_sliding" -> sliding,
    "stream_sessionize" -> sessionize,
    "stream_dedup" -> dedupFirst,
    "stream_dedup_horizon" -> dedupHorizon,
    "stream_topk" -> topkPerWindow,
    "stream_enrich" -> enrich,
    "stream_join" -> clickPurchase,
    "events_funnel" -> funnel,
  )

  val rawOracles: Map[String, String] = Map(
    "stream_unique_users" ->
      ("SELECT epoch(date_trunc('hour', ts))::BIGINT AS ws, " +
        "count(DISTINCT user_id) AS unique_users FROM events GROUP BY 1"),

    "stream_enrich" ->
      ("SELECT c_mktsegment AS segment, event_type, count(*) AS n, " +
        "rnd(sum(value), 6) AS sv FROM events " +
        "JOIN customer ON user_id = c_custkey - 1 GROUP BY 1, 2"),

    "stream_join" ->
      ("WITH c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS cus " +
        "FROM events WHERE event_type = 'click'), " +
        "p AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pus " +
        "FROM events WHERE event_type = 'purchase') " +
        "SELECT c.user_id, click_id, purchase_id FROM c JOIN p USING (user_id) " +
        "WHERE pus > cus AND pus - cus <= 1800000000"),

    "events_funnel" ->
      ("WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events " +
        "WHERE event_type = 'signup' GROUP BY 1), " +
        "s2 AS (SELECT e.user_id, min(epoch_us(ts)) AS t2 FROM events e " +
        "JOIN s1 ON e.user_id = s1.user_id AND epoch_us(ts) > s1.t1 " +
        "WHERE event_type = 'click' GROUP BY 1), " +
        "s3 AS (SELECT e.user_id, min(epoch_us(ts)) AS t3 FROM events e " +
        "JOIN s2 ON e.user_id = s2.user_id AND epoch_us(ts) > s2.t2 " +
        "WHERE event_type = 'purchase' GROUP BY 1) " +
        "SELECT s1.user_id, t1, t2, t3, " +
        "(1 + (t2 IS NOT NULL)::INT + (t3 IS NOT NULL)::INT) AS stage " +
        "FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id " +
        "LEFT JOIN s3 ON s1.user_id = s3.user_id"),

    "stream_dedup" ->
      ("SELECT user_id, event_type, event_id FROM (" +
        "SELECT user_id, event_type, event_id, row_number() OVER (" +
        "PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn " +
        "FROM events) WHERE rn = 1"),

    "stream_dedup_horizon" ->
      ("SELECT ws, user_id, event_type, event_id FROM (" +
        "SELECT epoch(date_trunc('hour', ts))::BIGINT AS ws, user_id, " +
        "event_type, event_id, row_number() OVER (" +
        "PARTITION BY date_trunc('hour', ts), user_id, event_type " +
        "ORDER BY ts, event_id) AS rn FROM events) WHERE rn = 1"),

    "stream_topk" ->
      ("WITH agg AS (SELECT epoch(date_trunc('hour', ts))::BIGINT AS ws, event_type, " +
        "count(*) AS n FROM events GROUP BY 1, 2), " +
        "rk AS (SELECT ws, event_type, n, row_number() OVER (" +
        "PARTITION BY ws ORDER BY n DESC, event_type) AS rn FROM agg) " +
        "SELECT ws, event_type, n, rn::INT AS rn FROM rk WHERE rn <= 2"),

    "stream_sliding" ->
      ("SELECT ws, event_type, count(*) AS n, rnd(sum(value), 6) AS sv FROM (" +
        "SELECT ((epoch_us(ts) // 1000000) // 1800 - o) * 1800 AS ws, event_type, value " +
        "FROM events CROSS JOIN (SELECT unnest([0, 1]) AS o)) GROUP BY 1, 2"),

    "stream_tumbling" ->
      ("SELECT epoch(date_trunc('hour', ts))::BIGINT AS ws, event_type, " +
        "count(*) AS n, rnd(sum(value), 6) AS sv FROM events GROUP BY 1, 2"),

    "stream_sessionize" ->
      ("WITH g AS (SELECT user_id, event_id, value, ts, " +
        "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL " +
        "OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000 " +
        "THEN 1 ELSE 0 END AS new_s FROM events), " +
        "ss AS (SELECT user_id, value, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id FROM g) " +
        "SELECT user_id, session_id, count(*) AS n_events, rnd(sum(value), 6) AS sv " +
        "FROM ss GROUP BY 1, 2"),
  )
}
