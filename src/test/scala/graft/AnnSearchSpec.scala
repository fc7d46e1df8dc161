package graft

import org.apache.spark.sql.functions._

import graft.llm.AnnSearch

/** Approximation-quality guards for the ANN family: the bucketed/IVF
  * variants must recall a healthy fraction of the exact top-k — the
  * invariant that matters when the bucket join replaces the cross join
  * at scale.
  */
class AnnSearchSpec extends SparkSpecBase {

  private def recallVsExact(approx: org.apache.spark.sql.DataFrame,
      k: Int): Double = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), graft.core.Distance.asDouble(col("embedding")).as("v"),
        col("label"))
    val exact = graft.core.Knn.knn(
      e.filter(col("vec_id") < 20), e.filter(col("vec_id") >= 20), k)
      .select(col("q_id"), col("t_id"))
    val hit = approx.select(col("q_id"), col("t_id"))
      .join(exact, Seq("q_id", "t_id"), "left_semi").count()
    hit.toDouble / exact.count()
  }

  test("IVF ANN recalls >= 40% of exact L2 top-3 with nprobe=3") {
    val r = recallVsExact(AnnSearch.ivfTopK(spark, sfDir), 3)
    assert(r >= 0.4, s"IVF recall $r below floor")
  }

  test("Lloyd-refined centroids: recall >= stride seed at equal nprobe, count preserved") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), graft.core.Distance.asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") < 20).select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val t = e.filter(col("vec_id") >= 20).select(col("vec_id").as("t_id"), col("v").as("t_v"))
      .persist()
    try {
      val seed = e.filter(col("vec_id") >= 20 && col("vec_id") % 40 === 0)
        .select(col("vec_id").as("c_id"), col("v").as("c_v"))
      val refined = AnnSearch.kmeansCentroids(t, seed, iters = 3).persist()
      assert(refined.count() === seed.count(), "empty cells must keep their centroid")
      val rStride = recallVsExact(AnnSearch.ivfSearch(q, t, seed, k = 3, nprobe = 3), 3)
      val rKmeans = recallVsExact(AnnSearch.ivfSearch(q, t, refined, k = 3, nprobe = 3), 3)
      assert(rKmeans >= rStride, s"refined recall $rKmeans < stride recall $rStride")
      refined.unpersist()
    } finally t.unpersist()
  }

  test("kmeans refinement is deterministic (two runs bit-identical)") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), graft.core.Distance.asDouble(col("embedding")).as("v"))
    val t = e.filter(col("vec_id") >= 20).select(col("vec_id").as("t_id"), col("v").as("t_v"))
    val seed = e.filter(col("vec_id") >= 20 && col("vec_id") % 40 === 0)
      .select(col("vec_id").as("c_id"), col("v").as("c_v"))
    val a = collectSet(AnnSearch.kmeansCentroids(t, seed, iters = 2))
    val b = collectSet(AnnSearch.kmeansCentroids(t, seed, iters = 2))
    assert(a === b)
  }

  test("IVF result distances are exact for the pairs it returns") {
    // approximation is in candidate selection only — any returned pair's
    // distance must equal the exact L2 between its vectors
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), graft.core.Distance.asDouble(col("embedding")).as("v"))
    val ivf = AnnSearch.ivfTopK(spark, sfDir)
    val check = ivf
      .join(e.select(col("vec_id").as("q_id"), col("v").as("q_v")), "q_id")
      .join(e.select(col("vec_id").as("t_id"), col("v").as("t_v")), "t_id")
      .withColumn("d2", graft.rel.Queries.rnd(
        graft.functions.ArrayDistance.l2(col("q_v"), col("t_v")), 6))
      .filter(col("dist") =!= col("d2"))
    assert(check.count() === 0)
  }
}
