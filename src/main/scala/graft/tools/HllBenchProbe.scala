package graft.tools

import org.apache.spark.sql.SparkSession

/** Wall A/B for `graph_harmonic_hll`'s lgK declaration under bench
  * parity (local[32], shuffle 32, warmup, construction-inclusive
  * timing): `tools/run.sh graft.tools.HllBenchProbe <sfdir> [lgK…]`.
  * Run once on a quiet box and once under deliberate CPU load (the
  * SCALE.md contended regime) — the r12/r13 lesson is that this row's
  * cost is GC/shuffle-volume-bound and "quiet is fine" has failed as a
  * defense twice. Prints per-rep wall + process GC-time delta.
  */
object HllBenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val lgKs = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10, 7)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def run(dir: String, lgK: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val g0 = gcMs()
      graft.core.Ckpt.scoped {
        graft.rel.Graph.harmonicHll(
          graft.rel.Graph.custSuppEdges(spark, dir), lgK = lgK)
      }.count()
      ((System.nanoTime() - t0) / 1e9, gcMs() - g0)
    }
    lgKs.foreach(k => run("/root/testdata/sf0.001", k)) // codegen/JIT warmup
    spark.catalog.clearCache()
    System.gc()
    lgKs.foreach { k =>
      (1 to 3).foreach { i =>
        val (w, g) = run(sfDir, k)
        println(f"[hllbench] $sfDir lgK=$k rep$i wall=$w%.2f s gc_ms=$g")
        spark.catalog.clearCache()
        System.gc()
      }
    }
    spark.stop()
  }
}
