package graft.tools
import org.apache.spark.sql.SparkSession
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    args.foreach { q =>
      println(s"===== $q =====")
      val plan = graft.SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString
      // scan lines + join strategy lines only
      plan.linesIterator.filter(l =>
        l.contains("FileScan") || l.contains("PushedFilters") ||
        l.contains("Join") || l.contains("Exchange") || l.contains("Window")).take(40)
        .foreach(l => println(l.replaceAll("#\\d+", "").take(240)))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
