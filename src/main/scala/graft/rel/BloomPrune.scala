package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Manual Bloom-filter join pruning — the explicit form of Spark's
  * runtime row-level filter (`spark.sql.optimizer.runtime.bloomFilter`),
  * for when the optimizer can't prove selectivity (e.g. the small side
  * is a subquery the library user knows is selective, or the join is
  * built in stages across jobs).
  *
  * Mechanics: one distributed sketch aggregate over the small side's
  * join key (`BloomFilterAggregate` — the same Catalyst aggregate the
  * built-in runtime filter injects), ONE row collected to the driver
  * (the serialized sketch, not data — identical shape to how Spark
  * executes its injected scalar subquery), then re-embedded as a binary
  * literal inside `BloomFilterMightContain`, a codegen predicate that
  * sits in the big side's scan filter. At 100 TB this turns a
  * shuffle-everything join into "shuffle only rows that can match":
  * false positives (~3 % at the default sizing) are eliminated by the
  * real join afterwards, so pruning is output-invisible — which is why
  * `join_bloom_prune`'s DuckDB oracle is the PLAIN join.
  *
  * Both sides hash with `xxhash64` (what `BloomFilterMightContain`
  * requires of its value expression); an empty build side yields a
  * null sketch and `prune` short-circuits to an empty frame (= the
  * empty join result, still output-correct).
  *
  * Sizing: the sketch travels inside the serialized plan (the same
  * path Spark's injected runtime filter uses for its subquery result),
  * so `expectedItems` should reflect the real build-side cardinality —
  * the default 1 M keys ≈ 1.2 MB at 3 % fpp. Beyond ~50 M keys the
  * sketch itself is tens of MB and a pre-computed semi-join (or
  * `Bucketing`) is the better lever.
  */
object BloomPrune {

  /** Serialized Bloom sketch of `key` over `small` (null when empty). */
  def bloomOf(small: DataFrame, key: Column, expectedItems: Long = 1000000L): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)), expectedItems)
    small.agg(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]]("bf")
  }

  /** Filter `big` to rows whose `key` might be in the sketch. */
  def prune(big: DataFrame, key: Column, bloom: Array[Byte]): DataFrame =
    if (bloom == null) big.limit(0)
    else big.filter(ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType),
      ColumnBridge.expression(xxhash64(key)))))

  /** Equi-join with the big side Bloom-pruned before the shuffle. */
  def prunedJoin(big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L): DataFrame = {
    val bloom = bloomOf(small, small(smallKey), expectedItems)
    prune(big, big(bigKey), bloom).join(small, big(bigKey) === small(smallKey))
  }
}
