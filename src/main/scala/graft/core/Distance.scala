package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-distance Column builders over ARRAY<DOUBLE> columns.
  *
  * The reference computes Euclidean/Manhattan distance in a hand-written
  * per-partition loop over Array[Double] (SURVEY.md §2.1 [LINEAGE], kNN-IS
  * design). Spark-first equivalent: declarative higher-order functions so
  * the whole pipeline stays one Catalyst plan. The hot path uses the fused
  * codegen expressions in `graft.functions.ArrayDistance` (FusedL2/L1/Dot);
  * these HOF builders are the semantic definition `DistanceSpec` checks
  * them against (bit-identical: same element-order accumulation).
  *
  * Inputs MUST already be ARRAY<DOUBLE> (cast float→double before any
  * arithmetic — SURVEY §7.4 determinism rule #1).
  */
object Distance {

  /** Squared L2. Sequential left-to-right fold, same order as the oracle's
    * list_sum (round-6 at the edges absorbs last-ulp differences).
    */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => { val d = x - y; d * d }),
      lit(0.0),
      (acc, x) => acc + x)

  /** Euclidean distance. */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Manhattan distance (the reference's alternate metric [LINEAGE]). */
  def l1(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0.0), (acc, x) => acc + x)

  /** Dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(zip_with(a, a, (x, y) => x * y), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity (0-vector guarded to 0.0). NB this is the
    * SIMILARITY; the hot-path cosine DISTANCE (1 − cos, unguarded 0/0 →
    * NaN) is `ArrayDistance.cosine`, a one-pass fused expression
    * (DistanceSpec pins the relationship).
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Cast a float-array column to ARRAY<DOUBLE> (determinism rule #1). */
  def asDouble(a: Column): Column = a.cast("array<double>")
}
