package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-17 plan evidence dumper: writes `plans/r17/<query>_<suffix>.txt`
  * — `explain("formatted")` of each named DECLARED query as registered
  * (rows whose construction checkpoints eagerly show the final stage
  * over `Scan ExistingRDD`; the interesting contrast for those is the
  * stage/task shape, recorded in OPTIMIZATION_r17.md). Dev utility.
  *
  * `tools/run.sh graft.tools.PlanDumpR17 <suffix> <query> [query ...]`
  */
object PlanDumpR17 {
  def main(args: Array[String]): Unit = {
    val suffix = args(0)
    val names = args.drop(1).toSeq
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.functions.TopKAgg.FallbackConfKey,
        graft.functions.TopKAgg.FallbackThreshold.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r17"))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, d)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r17/${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote plans/r17/${name}_$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
