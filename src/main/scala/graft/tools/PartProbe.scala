package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-17 measurement probe: the RDD partition count of each shared
  * memo checkpoint. AQE coalesces the tiny build shuffles down to 1-2
  * partitions, and a localCheckpoint FREEZES that layout — every
  * consumer's first map stage (token joins, wedge expansion, walk
  * steps) then runs 1-2-way no matter how many cores the session has.
  * Dev utility.
  */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.functions.TopKAgg.FallbackConfKey,
        graft.functions.TopKAgg.FallbackThreshold.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def np(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      println(s"[part] $name rdd_partitions=${df.rdd.getNumPartitions} rows=${df.count()}")
    np("custSuppEdgesShared", graft.rel.Graph.custSuppEdgesShared(spark, d))
    np("coOrderEdgesShared", graft.rel.Graph.coOrderEdgesShared(spark, d))
    np("walksShared", graft.rel.Graph.walksShared(spark, d))
    spark.stop()
  }
}
