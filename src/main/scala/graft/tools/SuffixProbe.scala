package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate-space measurement for `dedup_suffix` (round 16): the
  * operator's scale claim is that the seed prefilter bounds the ranked
  * stream by the corpus's DUPLICATED-SPAN COVERAGE, not its size — this
  * prints the funnel (total suffix positions → seed-retained candidates
  * → cross-doc adjacent pairs → qualifying pairs) and the wall, at the
  * declared slice and at a 4× slice, so the bound is a measured ratio
  * rather than a scaladoc assertion.
  *
  * usage: tools/run.sh graft.tools.SuffixProbe [sfdir]
  */
object SuffixProbe {
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
    val cap = 120; val minLen = 30
    for (slice <- Seq(500L, 2000L)) {
      val docs = graft.Tables.documents(spark, sfDir)
        .filter(col("doc_id") < slice).select(col("doc_id"), col("text"))
      val t0 = System.nanoTime()
      val pos = docs.filter(length(col("text")) >= 1)
        .select(col("doc_id"),
          explode(expr("sequence(1, length(text))")).as("p"), col("text"))
        .select(col("doc_id"), col("p"),
          col("text").substr(col("p"), lit(cap)).as("s"))
        .withColumn("g", xxhash64(substring(col("s"), 1, minLen)))
        .persist()
      val total = pos.count()
      val dupSeed = pos.groupBy(col("g"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select("g")
      val kept = pos.join(dupSeed, Seq("g"), "left_semi").persist()
      val nKept = kept.count()
      val ranked = graft.rel.Rank.globalRank(kept.drop("g"),
        Seq(col("s"), col("doc_id"), col("p")))
      val right = ranked.select((col("grank") - 1).as("grank"),
        col("doc_id").as("doc_id2"), col("s").as("s2"))
      val cross = ranked.select(col("grank"), col("doc_id"), col("s"))
        .join(right, "grank").filter(col("doc_id") =!= col("doc_id2")).persist()
      val nCross = cross.count()
      val minl = least(length(col("s")), length(col("s2")))
      val mism = array_min(filter(sequence(lit(1), minl),
        i => col("s").substr(i, lit(1)) =!= col("s2").substr(i, lit(1))))
      val nQual = cross
        .withColumn("lcp", (coalesce(mism, minl + lit(1)) - 1).cast("long"))
        .filter(col("lcp") >= minLen).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[suffix] slice<$slice%-5d positions=$total%8d seed_retained=$nKept%8d " +
        f"(${100.0 * nKept / math.max(1L, total)}%5.1f%%) cross_adjacent=$nCross%7d " +
        f"qualifying=$nQual%7d wall=$wall%6.2f s")
      pos.unpersist(blocking = false)
      kept.unpersist(blocking = false)
      cross.unpersist(blocking = false)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
