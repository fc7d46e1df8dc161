package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ArrayDistance, TopKAgg}

/** The distributed-kNN kernel, relationally.
  *
  * The reference (kNN-IS design, SURVEY.md §2.1 [LINEAGE]) broadcasts test
  * chunks against cached train partitions, computes local k-nearest in
  * mapPartitions, and merges candidate lists in reduceByKey. The Spark-first
  * decomposition of the same dataflow:
  *
  *   queries crossJoin train                (broadcast when genuinely small)
  *   + fused distance expression            (= the per-pair hot loop)
  *   + bounded-heap grouped top-k           (= local top-k + merge-k)
  *
  * Physical placement: when the query side carries an explicit
  * `broadcast()` hint (a small query block — the kNN-IS chunk analogue),
  * Catalyst picks BroadcastNestedLoopJoin, exactly the reference's
  * placement. WITHOUT the hint (e.g. the train self-join in
  * `Fknn.membershipInit`, where the "query" side is ~the whole dataset),
  * Catalyst/AQE size-gates the decision itself — small inputs still
  * broadcast, large ones fall back to a partitioned cartesian, and the
  * per-query cost is bounded by `TopKAgg`'s map-side combine. For query
  * sets too big for any single broadcast, chunk by id-range
  * (`Fknn.membershipInitChunked`, the reference's `numIterations`).
  */
object Knn {

  /** All query×train pairs with distance.
    * Output columns: (q_id, t_id, dist).
    * `q`/`t` must have columns (idCol, vecCol) with vecCol ARRAY<DOUBLE>.
    *
    * @param hintBroadcastQ force-broadcast the query side. Default FALSE
    *   (round-5 flip): only call sites whose query block is known-small BY
    *   CONSTRUCTION (a kNN-IS per-block chunk, a literal-bounded filter)
    *   opt in. Everything else — including "looks small at this SF" splits
    *   like `vec_id % 10 == 0`, which are corpus-proportional — leaves the
    *   decision to Catalyst/AQE size gating. A forced broadcast of a
    *   corpus-proportional side is a guaranteed executor OOM at 100×.
    */
  /** Small-file inputs (one parquet footer) arrive as 1 scan partition; a
    * cross join streamed over 1 partition runs on 1 core no matter how many
    * the cluster has. Re-spread only when below the session's parallelism —
    * at real scale inputs already have ≥ that many partitions and this is a
    * no-op (no shuffle added).
    *
    * The split-count estimate is LOGICAL-stats-based (sizeInBytes /
    * maxPartitionBytes ≈ the file-source split count): touching `df.rdd`
    * here would force a physical plan outside AQE on every call — this
    * keeps AQE the sole owner of the physical plan. Two cases the size
    * estimate cannot see:
    *  - an EXPLICIT `coalesce(n)`/`repartition(n)` with small n in the
    *    caller's lineage squeezes a big frame onto few cores while the
    *    stats still say "big" — those are logical nodes, so they ARE
    *    detectable, and we re-spread when one caps below target;
    *  - physically unsplittable opaque inputs (RDD-backed frames,
    *    non-splittable codecs) are invisible at the logical layer —
    *    out of contract; the engine's inputs are splittable file
    *    sources (parquet throughout).
    */
  /** True when an explicit low-count `coalesce`/`repartition` in the
    * lineage still governs the frame's parallelism: nothing between it
    * and the root re-shuffles. Descent stops at nodes whose execution
    * introduces an exchange that restores partitioning (aggregate,
    * global sort, adequate explicit repartitions). Joins are traversed:
    * a broadcast join preserves the streamed side's (possibly capped)
    * partitioning.
    */
  private[graft] def cappedBelowTarget(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, target: Int): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Repartition, RepartitionByExpression, Sort}
    p match {
      case r: Repartition => r.numPartitions < target
      case r: RepartitionByExpression => r.optNumPartitions.exists(_ < target)
      case _: Aggregate => false
      case s: Sort if s.global => false
      case other => other.children.exists(cappedBelowTarget(_, target))
    }
  }

  private[graft] def ensureParallelism(df: DataFrame): DataFrame = {
    val sess = df.sparkSession
    val target = sess.sparkContext.defaultParallelism
    val maxPartBytes = sess.sessionState.conf.filesMaxPartitionBytes
    val plan = df.queryExecution.optimizedPlan
    val estParts = plan.stats.sizeInBytes / maxPartBytes + 1
    if (cappedBelowTarget(plan, target) || estParts < target) df.repartition(target) else df
  }

  def pairwise(
      q: DataFrame,
      t: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "v",
      dist: (Column, Column) => Column = ArrayDistance.l2,
      hintBroadcastQ: Boolean = false): DataFrame = {
    val qr = q.select(col(idCol).as("q_id"), col(vecCol).as("q_v"))
    val tr = t.select(col(idCol).as("t_id"), col(vecCol).as("t_v"))
    val joined =
      if (hintBroadcastQ) broadcast(qr).crossJoin(ensureParallelism(tr))
      else ensureParallelism(qr).crossJoin(ensureParallelism(tr))
    joined.select(col("q_id"), col("t_id"), dist(col("q_v"), col("t_v")).as("dist"))
  }

  /** Keep the k nearest t_id per q_id — bounded-heap aggregate (partial
    * top-k before shuffle; the scale path). Output (q_id, t_id, dist, rn).
    */
  def topK(pairs: DataFrame, k: Int): DataFrame = TopKAgg.knn(pairs, k)

  /** Window-function formulation of grouped top-k. Semantically identical
    * to `topK` (KnnSpec asserts it); full sort per partition — fine at
    * small scale, kept as the executable spec for the aggregator.
    *
    * NULL dist/t_id rows are dropped up front: the heap aggregate skips
    * NULL inputs, so this filter is what makes the two formulations (and
    * the `GroupedTopKRewrite` rule that converts one into the other)
    * genuinely equivalent — and it plants the IsNotNull constraint the
    * rule's nullability guard requires.
    */
  def topKWindow(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("t_id"))
    pairs.filter(col("dist").isNotNull && col("t_id").isNotNull)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** k nearest train rows per query row: (q_id, t_id, dist, rn). */
  def knn(
      q: DataFrame,
      t: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "v",
      dist: (Column, Column) => Column = ArrayDistance.l2,
      hintBroadcastQ: Boolean = false): DataFrame =
    topK(pairwise(q, t, idCol, vecCol, dist, hintBroadcastQ), k)
}
