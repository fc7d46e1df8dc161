package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit harness: prints `.explain("formatted")` for the
  * named queries (args, or a default set of the most recently added
  * ones) against sf0.001. Used per the working rule "after each
  * operator works, explain the plan and iterate until it's the plan
  * you'd want" — run with `sbt "runMain graft.tools.PlanAudit q1 q2"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val qs =
      if (args.nonEmpty) args.toSeq
      else Seq("agg_topk_freq", "join_skew_salted", "embedding_normalize",
        "embedding_centroid", "sample_stratified", "corpus_mix")
    for (q <- qs) {
      println(s"===== $q =====")
      graft.SparkEntry.queries(q)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
