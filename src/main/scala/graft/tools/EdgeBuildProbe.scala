package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Ckpt

/** Round-16 measurement probe: how much of each graph row is the shared
  * edge-list build? Times `custSuppEdges().truncated()` and
  * `coOrderEdges().truncated()` in isolation (the per-query prologue all
  * 21 graph rows repay), at the bench's SF/core protocol. Dev utility.
  */
object EdgeBuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(body: => Unit): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      body
      println(f"[edge] $label run$i wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warmup (codegen)
    Ckpt.release { val e = graft.rel.Graph.custSuppEdges(spark, "/root/testdata/sf0.001"); Ckpt.truncate(e) }
    time("custSuppEdges.truncate") {
      val e = Ckpt.truncate(graft.rel.Graph.custSuppEdges(spark, sfDir))
      Ckpt.release(e)
    }
    time("coOrderEdges.truncate") {
      val e = Ckpt.truncate(graft.rel.Graph.coOrderEdges(spark, sfDir))
      Ckpt.release(e)
    }
    spark.stop()
  }
}
