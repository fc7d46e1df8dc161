package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 A/B: `randomWalks(ckptEvery = 1 vs 2)` at the DECLARED
  * 4-step shape, warm and interleaved in one JVM (the round-12 sweep's
  * first leg was cold, so its K=1 reading absorbed session JIT). Reads
  * the shared edges memo exactly as `walksShared` does; checksums
  * asserted equal every rep. usage: tools/run.sh graft.tools.WalkCkptAbProbe [sfdir]
  */
object WalkCkptAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.rel.Graph.custSuppEdgesShared(spark, sfDir)
    def run(k: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val df = graft.rel.Graph.randomWalks(edges, ckptEvery = k)
      val chk = df.agg(sum(expr("walk * 31 + step * 7 + node"))).head().getLong(0)
      graft.core.Ckpt.release(df)
      spark.catalog.clearCache()
      ((System.nanoTime() - t0) / 1e9, chk)
    }
    run(1); run(2) // warmup both shapes, untimed
    var ref = -1L
    for (rep <- 1 to 3; k <- Seq(1, 2)) {
      val (w, chk) = run(k)
      if (ref == -1L) ref = chk
      println(f"[walk-ab] rep$rep ckptEvery=$k wall=$w%5.2f s " +
        s"checksum ${if (chk == ref) "EQUAL" else s"DIFFER $chk vs $ref"}")
      assert(chk == ref)
    }
    spark.stop()
  }
}
