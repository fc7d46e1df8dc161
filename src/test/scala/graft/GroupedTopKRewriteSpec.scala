package graft

import org.apache.spark.sql.functions._

import graft.core.{Distance, Knn}
import graft.plans.GroupedTopKRewrite

/** The window→bounded-heap optimizer rule: fires on the canonical grouped
  * top-k pattern, leaves everything else alone, and preserves results.
  */
class GroupedTopKRewriteSpec extends SparkSpecBase {

  private def emb = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), Distance.asDouble(col("embedding")).as("v"), col("label"))

  test("window top-k rewrites to the topk aggregate with identical results") {
    val q = emb.filter(col("vec_id") % 10 === 0)
    val t = emb.filter(col("vec_id") % 10 =!= 0)
    val pairs = Knn.pairwise(q, t)
    val windowed = Knn.topKWindow(pairs, 5).select("q_id", "t_id", "dist", "rn")
    val baseline = collectSet(windowed)

    spark.experimental.extraOptimizations ++= Seq(GroupedTopKRewrite)
    try {
      val rewritten = Knn.topKWindow(pairs, 5).select("q_id", "t_id", "dist", "rn")
      val optimized = rewritten.queryExecution.optimizedPlan.toString
      assert(optimized.contains("topk_agg"), s"rule did not fire:\n$optimized")
      // the full Window node must be gone; Spark's InferWindowGroupLimit
      // may leave a WindowGroupLimit below the aggregate — that's a
      // per-partition k-prefilter, strictly helpful
      assert(!optimized.contains("Window ["), s"window survived:\n$optimized")
      assert(collectSet(rewritten) === baseline)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == GroupedTopKRewrite)
    }
  }

  test("rule leaves non-canonical windows alone (desc order, extra columns)") {
    spark.experimental.extraOptimizations ++= Seq(GroupedTopKRewrite)
    try {
      // descending order: not the top-k-smallest pattern
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("dist").desc, col("t_id"))
      val q = emb.filter(col("vec_id") % 10 === 0)
      val t = emb.filter(col("vec_id") % 10 =!= 0)
      val df = Knn.pairwise(q, t)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("topk_agg"))
      assert(df.count() > 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == GroupedTopKRewrite)
    }
  }
}
