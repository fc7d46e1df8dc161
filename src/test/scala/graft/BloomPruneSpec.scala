package graft

import org.apache.spark.sql.functions._

import graft.rel.BloomPrune

class BloomPruneSpec extends SparkSpecBase {
  import spark.implicits._

  test("prune never drops a key present in the build side (no false negatives)") {
    val big = spark.range(0, 10000).select(col("id").as("k"))
    val small = spark.range(0, 10000, 97).select(col("id").as("k"))
    val bloom = BloomPrune.bloomOf(small, small("k"), expectedItems = 1000)
    val pruned = BloomPrune.prune(big, big("k"), bloom)
    // every true member survives the filter
    assert(small.join(pruned, "k").count() === small.count())
  }

  test("prune actually prunes (pruned cardinality well under the big side)") {
    val big = spark.range(0, 100000).select(col("id").as("k"))
    val small = spark.range(0, 100).select((col("id") * 1000).as("k"))
    val bloom = BloomPrune.bloomOf(small, small("k"), expectedItems = 100)
    val n = BloomPrune.prune(big, big("k"), bloom).count()
    assert(n >= 100)     // all true members
    assert(n < 10000)    // ≥ 90% of non-members rejected
  }

  test("prunedJoin ≡ plain join on the harness tables") {
    val li = Tables.lineitem(spark, sfDir)
    val sel = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 470000)
    val pruned = BloomPrune.prunedJoin(li, "l_orderkey", sel, "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderkey"))
    val plain = li.join(sel, li("l_orderkey") === sel("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderkey"))
    assert(collectSet(pruned) === collectSet(plain))
  }

  test("empty build side yields the empty join, not a crash") {
    val big = spark.range(0, 100).select(col("id").as("k"))
    val small = spark.range(0, 100).select(col("id").as("k")).filter(col("k") < 0)
    assert(BloomPrune.prunedJoin(big, "k", small, "k").count() === 0)
  }
}
