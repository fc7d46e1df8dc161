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

  test("rule does not fire on nullable order keys (NULL dist keeps window semantics)") {
    spark.experimental.extraOptimizations ++= Seq(GroupedTopKRewrite)
    try {
      import spark.implicits._
      // NULL dist: ASC ranks NULLS FIRST, so the NULL row IS in the top-k
      // under window semantics; the heap aggregate would skip it. The rule
      // must leave this plan alone (nullable keys) — results stay window.
      val pairs = Seq(
        (1L, Some(0.5), 10L), (1L, None, 11L), (1L, Some(0.1), 12L),
        (2L, Some(0.3), 13L), (2L, Some(0.2), 14L))
        .toDF("q_id", "dist", "t_id")
        .select(col("q_id"), col("dist").cast("double").as("dist"), col("t_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("dist"), col("t_id"))
      val df = pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("topk_agg"), s"rule fired on nullable keys:\n$optimized")
      val got = df.select("q_id", "t_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // NULLS FIRST: for q_id=1 the NULL-dist row ranks 1st
      assert(got === Set((1L, 11L, 1), (1L, 12L, 2), (2L, 14L, 1), (2L, 13L, 2)))
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
