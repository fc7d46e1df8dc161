package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL ranks without a single-partition window.
  *
  * `Window.orderBy(...)` with no partition key moves the whole frame
  * through ONE task — acceptable when the frame is domain- or
  * calendar-bounded (distinct prices, hourly buckets, eval slices),
  * fatal when it scales with the corpus (per-USER frames under
  * `events_rfm` / `events_power_users`). This is the general container
  * for that case, the `corpusZipfScalable` shape promoted to a shared
  * seam: range-repartition on the sort key (each task sorts only its
  * range slice), per-partition `row_number`, then per-partition counts
  * prefix-summed over a partitions-count-sized frame and broadcast back
  * as base offsets. Ranks are IDENTICAL to the global window whenever
  * the sort key is a total order (every caller here ends its key in a
  * unique id) — partition boundaries shift which pid a row lands in,
  * never its rank.
  */
object Rank {

  /** Append `grank` (1-based global row_number by `sort`) to `df`.
    * `sort` must be a total order for cross-run determinism.
    */
  def globalRank(df: DataFrame, sort: Seq[Column], parts: Int = 0): DataFrame = {
    import graft.core.Ckpt.TruncateSyntax
    val n =
      if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, sort: _*)
      .withColumn("pid", spark_partition_id())
    val inPart = Window.partitionBy(col("pid")).orderBy(sort: _*)
    // MATERIALIZED once (Ckpt seam) before fanning out to the offsets
    // aggregate AND the join back: the two subtrees otherwise
    // re-evaluate the range exchange independently, and
    // RangePartitioner's boundary SAMPLE depends on the input rows'
    // within-partition order — deterministic off a parquet scan, but
    // NOT across re-evaluations of upstream shuffles (reduce-side fetch
    // order varies run to run). Found live: three chained globalRanks
    // in events_rfm produced pid assignments that disagreed between the
    // offsets and join evaluations at 4 threads — unique-but-wrong
    // ranks, 63 misplaced quartile scores at sf0.1.
    val local = ranged.withColumn("r_in", row_number().over(inPart).cast("long"))
      .truncated()
    val offsets = local.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .withColumn("base", coalesce(sum(col("cnt")).over(
        Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pid"), col("base"))
    local.join(broadcast(offsets), "pid")
      .withColumn("grank", col("base") + col("r_in"))
      .drop("pid", "r_in", "base")
  }

  /** Per-distinct-value MIDRANKS without ranking the row stream: the
    * tied-rank primitive under `stats_spearman` / `stats_kruskal`.
    * Returns one row per distinct value of `v` with its tie count and
    * `mr_r2` = 2·midrank (kept doubled so it stays BIGINT-exact —
    * 2·midrank = 2·cum_before + t + 1, the `stats_mannwhitney`
    * algebra). Scale shape: the corpus collapses FIRST through a keyed
    * count (map-side combinable, output = |distinct values| rows), and
    * only that distinct frame rides the range exchange + prefix sum —
    * for a 50-distinct-values column the exchange carries 50 rows no
    * matter the corpus. Same two-pass offsets discipline as
    * `globalRank`/`prefixPackBy` (Ckpt-truncated before the fan-out;
    * the offsets window is over a ≤ partitions-count frame).
    *
    * NULL values: callers filter them first — Spark sorts NULL FIRST
    * ascending where DuckDB defaults NULLS LAST, so a null group's
    * rank would silently disagree with a SQL oracle (applies to
    * `midranksBy`/`groupMedian`/`groupQuantiles` too). Every wired
    * caller ranks non-null measure columns.
    */
  def midranks(df: DataFrame, v: Column, parts: Int = 0): DataFrame = {
    import graft.core.Ckpt.TruncateSyntax
    val counts = df.groupBy(v.as("mr_v")).agg(count(lit(1)).as("mr_t"))
    val n =
      if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = counts.repartitionByRange(n, col("mr_v"))
      .withColumn("pid", spark_partition_id())
    val inPart = Window.partitionBy(col("pid")).orderBy(col("mr_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("cum_in", sum(col("mr_t")).over(inPart))
      .truncated()
    val offsets = local.groupBy(col("pid")).agg(max(col("cum_in")).as("tot"))
      .withColumn("base", coalesce(sum(col("tot")).over(
        Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("pid"), col("base"))
    local.join(broadcast(offsets), "pid")
      .select(col("mr_v"), col("mr_t"),
        (lit(2L) * (col("base") + col("cum_in") - col("mr_t")) +
          col("mr_t") + 1).as("mr_r2"))
  }

  /** KEYED `midranks`: per-(key, distinct value) tie counts, inclusive
    * cumulative counts and 2·midranks WITHIN each key group — the
    * per-group exact-quantile seam (`stats_levene`'s group medians).
    * A `Window.partitionBy(key).orderBy(v)` would serialize each
    * group's whole distinct-value history through one task — fatal
    * when key cardinality is O(1) (event types) while the corpus
    * scales; this is the `prefixPackBy` two-pass shape on the distinct
    * frame instead: range-repartition on (key, v), per-partition local
    * cumsum, per-(key, pid) totals prefix-summed over a bounded frame
    * and broadcast back. Returns (mr_k, mr_v, mr_t, mr_cum, mr_r2).
    */
  def midranksBy(df: DataFrame, key: Column, v: Column,
      parts: Int = 0): DataFrame = {
    import graft.core.Ckpt.TruncateSyntax
    val counts = df.groupBy(key.as("mr_k"), v.as("mr_v"))
      .agg(count(lit(1)).as("mr_t"))
    val n =
      if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = counts.repartitionByRange(n, col("mr_k"), col("mr_v"))
      .withColumn("pid", spark_partition_id())
    val inPart = Window.partitionBy(col("pid"), col("mr_k")).orderBy(col("mr_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("cum_in", sum(col("mr_t")).over(inPart))
      .truncated()
    val offsets = local.groupBy(col("mr_k"), col("pid"))
      .agg(max(col("cum_in")).as("tot"))
      .withColumn("base", coalesce(sum(col("tot")).over(
        Window.partitionBy(col("mr_k")).orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("mr_k"), col("pid"), col("base"))
    local.join(broadcast(offsets), Seq("mr_k", "pid"))
      .withColumn("mr_cum", col("base") + col("cum_in"))
      .select(col("mr_k"), col("mr_v"), col("mr_t"), col("mr_cum"),
        (lit(2L) * (col("mr_cum") - col("mr_t")) + col("mr_t") + 1).as("mr_r2"))
  }

  /** Per-key EXACT QUANTILES from `midranksBy`: for each requested
    * per-mille point q, the smallest value whose inclusive cumulative
    * count reaches ceil(q·n/1000) — the inverted-CDF (type-1)
    * convention, all-integer thresholds so both engines cut
    * identically. The quantile list broadcasts against the per-group
    * distinct frame; one filter + keyed min per point. Returns
    * (mr_k, q_permille, mr_v).
    */
  def groupQuantiles(df: DataFrame, key: Column, v: Column,
      permille: Seq[Int]): DataFrame = {
    val mr = midranksBy(df, key, v)
    val totals = mr.groupBy(col("mr_k")).agg(max(col("mr_cum")).as("mr_n"))
    val qs = df.sparkSession.createDataFrame(
      permille.map(Tuple1(_))).toDF("q_permille")
    // integer cum ≥ ceil(n·q/1000) ⟺ 1000·cum ≥ n·q — no division at all
    mr.join(totals, "mr_k")
      .join(broadcast(qs),
        col("mr_cum") * 1000 >= col("mr_n") * col("q_permille"))
      .groupBy(col("mr_k"), col("q_permille"))
      .agg(min(col("mr_v")).as("mr_v"))
  }

  /** Per-key LOWER MEDIAN from `midranksBy`: the smallest value whose
    * inclusive cumulative count reaches half the group (exact median
    * for odd group sizes, lower-middle for even — deterministic, no
    * cross-engine averaging convention). One extra keyed aggregate for
    * the group totals; never a row-stream sort.
    */
  def groupMedian(df: DataFrame, key: Column, v: Column): DataFrame = {
    val mr = midranksBy(df, key, v)
    val totals = mr.groupBy(col("mr_k")).agg(max(col("mr_cum")).as("mr_n"))
    mr.join(totals, "mr_k")
      .filter(col("mr_cum") * 2 >= col("mr_n"))
      .groupBy(col("mr_k"))
      .agg(min(col("mr_v")).as("mr_median"))
  }

  /** Standard SQL ntile from a 1-based global rank: n rows cut into k
    * tiles, the first (n mod k) tiles one row larger — the exact
    * bucketing Spark's and DuckDB's `ntile` both implement, in closed
    * form so it composes with `globalRank` instead of a window. All
    * integer `div`/`%` arithmetic (rank·k products stay far below 2^63
    * for any real corpus because k is small).
    */
  def ntileOf(rank: Column, nTotal: Column, k: Int): Column = {
    val q = nTotal.divide(k).cast("long") // n div k: exact (k small, n < 2^53)
    val m = nTotal % k
    val threshold = m * (q + 1)
    when(q === 0, rank) // n < k: rank i goes to tile i
      .when(rank <= threshold, (rank + q).divide(q + 1).cast("long"))
      .otherwise(m + (rank - threshold + q - 1).divide(q).cast("long"))
  }
}
