package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for large equi-joins.
  *
  * First line of defense at scale is AQE's skew-join split
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default): oversized
  * sort-merge partitions are split at runtime. Salting is the manual
  * lever for the case AQE can't fix — a hot KEY (not just a hot
  * partition) whose rows must all meet the same right-side rows: spread
  * the hot key's rows over `salts` sub-keys and replicate the right side
  * once per salt, trading `salts`× right-side duplication for `salts`-way
  * parallelism on the hot key. Replication is a projection (no shuffle of
  * the left side beyond the join's own), so this stays declarative and
  * codegen-friendly.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `key` with the left side salted.
    * Result is identical to `left.join(right, key)` (SkewSpec asserts);
    * the salt only changes physical row placement.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    // deterministic spread: row id modulo salts (value is irrelevant to
    // the join result; it only partitions each key's rows)
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
