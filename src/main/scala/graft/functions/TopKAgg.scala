package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-k as a bounded-heap typed Aggregator.
  *
  * This is the Spark-first form of the reference's kNN-IS merge step
  * (SURVEY.md §2.1 [LINEAGE]): each map task keeps only the k best
  * candidates per query (partial aggregation / map-side combine), and the
  * shuffle then moves at most k rows per (query, partition) instead of the
  * full O(|Q|·|T|) pair stream — the `reduceByKey(mergeKSmallest)` of the
  * reference, expressed as an `Aggregator` so Catalyst plans it as a
  * regular two-phase aggregate.
  *
  * Versus the window `row_number` formulation (`Knn.topKWindow`): the
  * window must shuffle and fully sort every pair; this aggregator shuffles
  * k rows per query per upstream partition. At 100 TB that difference is
  * the whole game. Ordering is the total order (dist, id) — id uniqueness
  * makes the k-set deterministic regardless of arrival order (SURVEY §7.4
  * rule #3).
  */
case class TopKBuf(var dists: Array[Double], var ids: Array[Long], var n: Int)

class TopKAgg(k: Int) extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]] {
  require(k > 0, "k must be positive")

  def zero: TopKBuf = TopKBuf(new Array[Double](k), new Array[Long](k), 0)

  /** Insert (d, id) keeping the arrays sorted ascending by (d, id), ≤ k. */
  private def insert(b: TopKBuf, d: Double, id: Long): TopKBuf = {
    val worstIdx = b.n - 1
    if (b.n == k && (d > b.dists(worstIdx) || (d == b.dists(worstIdx) && id >= b.ids(worstIdx)))) {
      return b // not better than the current k-th best
    }
    // find insertion point from the tail (inputs are near-random; k is tiny)
    var i = math.min(b.n, k - 1) // last writable slot
    while (i > 0 && (b.dists(i - 1) > d || (b.dists(i - 1) == d && b.ids(i - 1) > id))) {
      b.dists(i) = b.dists(i - 1)
      b.ids(i) = b.ids(i - 1)
      i -= 1
    }
    b.dists(i) = d
    b.ids(i) = id
    if (b.n < k) b.n += 1
    b
  }

  def reduce(b: TopKBuf, in: (Double, Long)): TopKBuf = insert(b, in._1, in._2)

  def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var i = 0
    while (i < b.n) { insert(a, b.dists(i), b.ids(i)); i += 1 }
    a
  }

  def finish(b: TopKBuf): Seq[(Double, Long)] = {
    val out = new Array[(Double, Long)](b.n)
    var i = 0
    while (i < b.n) { out(i) = (b.dists(i), b.ids(i)); i += 1 }
    out.toSeq
  }

  def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder[TopKBuf]()
  def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAgg {
  /** (q_id, t_id, dist) pairs → (q_id, t_id, dist, rn) with rn ∈ [1,k],
    * ascending (dist, t_id) per q_id — same shape as the window top-k. */
  def knn(pairs: DataFrame, k: Int): DataFrame = {
    implicit val inEnc: Encoder[(Double, Long)] = ExpressionEncoder[(Double, Long)]()
    val tk = udaf(new TopKAgg(k))
    pairs
      .groupBy(col("q_id"))
      .agg(tk(col("dist"), col("t_id")).as("nn"))
      .select(col("q_id"), posexplode(col("nn")))
      .select(
        col("q_id"),
        col("col._2").as("t_id"),
        col("col._1").as("dist"),
        (col("pos") + 1).cast("int").as("rn"))
  }
}
