package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Bucketed co-located join: the ingest-once/join-free-forever plan shape.
  * Asserts the physical property itself — no Exchange under the
  * SortMergeJoin when both sides are bucketed on the join key.
  */
class BucketingSpec extends SparkSpecBase {

  test("equi-join on the bucket key plans without a shuffle") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", buckets = 4)
    Bucketing.writeBucketed(ord, "ord_b", "l_orderkey", buckets = 4)
    try {
      val joined = Bucketing.bucketedJoin(spark, "li_b", "ord_b", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it still computes the right thing
      val expect = li.join(ord, "l_orderkey").count()
      assert(joined.count() === expect)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
