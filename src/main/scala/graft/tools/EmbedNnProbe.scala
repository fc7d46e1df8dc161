package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quality measurement for `graph_embed_nn` (round 14 — the number
  * behind the RunEmbedSpec pin): mean fraction of each seed's top-3
  * embedding neighbors that appear in the walk corpus's own top-3
  * co-occurrence partners, plus determinism across two invocations.
  * `tools/run.sh graft.tools.EmbedNnProbe <sfdir>`
  */
object EmbedNnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r1 = graft.SparkEntry.queries("graph_embed_nn")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val r2 = graft.SparkEntry.queries("graph_embed_nn")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    println(s"[embednn] $sfDir rows=${r1.length} deterministic=${r1.toSet == r2.toSet}")
    val walks = graft.rel.Graph.walksShared(spark, sfDir)
    val coTop = graft.rel.Graph.walkCooccur(walks, window = 2)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("center"))
          .orderBy(col("n_pairs").desc, col("context"))))
      .filter(col("rk") <= 3)
      .select(col("center"), col("context"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val seeds = r1.map(_._1).distinct
    val perSeed = seeds.map { s =>
      val nb = r1.filter(_._1 == s).map(_._2)
      nb.count(n => coTop.contains((s, n))).toDouble / nb.length
    }
    println(f"[embednn] $sfDir seeds=${seeds.length} mean_overlap=${perSeed.sum / perSeed.length}%.4f " +
      f"min_overlap=${perSeed.min}%.4f")
    spark.stop()
  }
}
