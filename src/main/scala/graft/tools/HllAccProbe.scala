package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Accuracy probe for the `graph_harmonic_hll` lgK declaration
  * (round 14, VERDICT r13 #1): per-seed relative error of the
  * HyperBall estimates vs exact `harmonicPerSeed` at each candidate
  * lgK — the measurement behind the GraphSpec envelope re-pin.
  * `tools/run.sh graft.tools.HllAccProbe <sfdir> [lgK…]`
  */
object HllAccProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val lgKs = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10, 8, 7, 6)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.rel.Graph.custSuppEdges(spark, sfDir)
    val seeds = edges.select(col("src").as("node")).distinct()
      .filter(col("node") % graft.rel.Graph.BfsSeedMod === 0)
    val exact = graft.rel.Graph.harmonicPerSeed(edges, seeds)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    lgKs.foreach { lgK =>
      val est = graft.rel.Graph.harmonicHll(edges, lgK = lgK)
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
      val errs = est.toSeq.map { case (seed, (nEst, hEst)) =>
        val (nEx, hEx) = exact(seed)
        (math.abs(nEst - nEx) / math.max(1.0, nEx.toDouble),
          math.abs(hEst - hEx) / math.max(1e-9, hEx))
      }
      val (nErr, hErr) = (errs.map(_._1), errs.map(_._2))
      println(f"[hllacc] $sfDir lgK=$lgK seeds=${errs.size} " +
        f"n_err max=${nErr.max}%.4f mean=${nErr.sum / nErr.size}%.4f " +
        f"h_err max=${hErr.max}%.4f mean=${hErr.sum / hErr.size}%.4f")
    }
    spark.stop()
  }
}
