package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed-kNN kernel, relationally.
  *
  * The reference (kNN-IS design, SURVEY.md §2.1 [LINEAGE]) broadcasts test
  * chunks against cached train partitions, computes local k-nearest in
  * mapPartitions, and merges candidate lists in reduceByKey. The Spark-first
  * decomposition of the same dataflow:
  *
  *   broadcast(queries) crossJoin train        (= the broadcast of the chunk)
  *   + distance expression                     (= the per-pair hot loop)
  *   + grouped top-k                           (= local top-k + merge-k)
  *
  * Catalyst picks BroadcastNestedLoopJoin for the cross join when the query
  * side is broadcast-hinted, which is exactly the reference's physical
  * placement. Grouped top-k is a window row_number here (v1); the scale path
  * is the bounded-heap Aggregator in graft.functions (partial top-k before
  * shuffle == the reference's local-k + merge-k).
  */
object Knn {

  /** All query×train pairs with distance.
    * Output columns: (q_id, t_id, dist) plus `extra` carried columns.
    * `q`/`t` must have columns (idCol, vecCol) with vecCol ARRAY<DOUBLE>.
    */
  def pairwise(
      q: DataFrame,
      t: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "v",
      dist: (Column, Column) => Column = Distance.l2): DataFrame = {
    val qr = q.select(col(idCol).as("q_id"), col(vecCol).as("q_v"))
    val tr = t.select(col(idCol).as("t_id"), col(vecCol).as("t_v"))
    // Small side (queries) broadcast — the kNN-IS chunk broadcast analogue.
    broadcast(qr).crossJoin(tr)
      .select(col("q_id"), col("t_id"), dist(col("q_v"), col("t_v")).as("dist"))
  }

  /** Keep the k nearest t_id per q_id. Total order (dist, t_id) — ties are
    * impossible by unique-key suffix (SURVEY §7.4 rule #3).
    */
  def topK(pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("dist"), col("t_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** k nearest train rows per query row: (q_id, t_id, dist, rn). */
  def knn(
      q: DataFrame,
      t: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "v",
      dist: (Column, Column) => Column = Distance.l2): DataFrame =
    topK(pairwise(q, t, idCol, vecCol, dist), k)
}
