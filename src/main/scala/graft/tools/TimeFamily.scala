package graft.tools

import org.apache.spark.sql.SparkSession

/** Construction-inclusive timing for a LIST of declared queries run
  * sequentially in ONE session — the shape `Bench` measures, which
  * `TimeQuery`'s one-query-per-JVM form cannot: cross-query amortization
  * (the round-10 shared metrics materialization pays its pipeline on the
  * first family row and serves the rest from the checkpointed frame) only
  * shows up when the family shares a JVM. Mirrors Bench's discipline:
  * `clearCache()` + gc between queries, construction + count timed.
  *
  * `tools/run.sh graft.tools.TimeFamily <sfdir> <query> [query ...]`
  */
object TimeFamily {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.functions.TopKAgg.FallbackConfKey,
        graft.functions.TopKAgg.FallbackThreshold.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = graft.SparkEntry.queries
    var total = 0.0
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = qs(name)(spark, sfDir).count()
      val w = (System.nanoTime() - t0) / 1e9
      total += w
      println(f"[family] $name%-22s $w%6.2f s ($n rows)")
      spark.catalog.clearCache()
      System.gc()
    }
    println(f"[family] TOTAL ${names.size} queries: $total%.2f s")
    spark.stop()
  }
}
