package graft.tools

import org.apache.spark.sql.SparkSession

/** Production-shape walk-corpus probe (round 11, VERDICT r10 "what's
  * missing" #3): a graph-embedding trainer consumes R ≈ 10 walks/node ×
  * length 40-80, not the declared row's 1 × 4 — this measures the
  * library at that shape on the sf0.1 purchase graph, unbiased and
  * node2vec-biased. Each step is one state⋈adjacency equi-join with
  * per-step Ckpt truncation, so wall should scale ~linearly in
  * R × length; the biased form adds the common-neighbor probe join and
  * the per-walk cumulative window per step.
  *
  * usage: tools/run.sh graft.tools.WalkCorpusProbe [sfdir] [R=10] [len=40]
  */
object WalkCorpusProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val r = if (args.length > 1) args(1).toInt else 10
    val len = if (args.length > 2) args(2).toInt else 40
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val edges = graft.rel.Graph.custSuppEdges(spark, sfDir)
    def leg(name: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = build.count()
      println(f"[walk-corpus] $name%-22s R=$r len=$len rows=$n%,d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%7.1f s")
      spark.catalog.clearCache()
    }
    leg("unbiased")(graft.rel.Graph.randomWalks(edges,
      steps = len, seedMod = 20, walksPerSeed = r))
    // Ckpt-amortization sweep (round 12, VERDICT r11 #7): checkpoint
    // every K-th step — fewer writes, but each lazy step re-evaluates
    // its chain in the output union; bit-identity asserted per K
    val ref = graft.rel.Graph.randomWalks(edges,
      steps = len, seedMod = 20, walksPerSeed = r)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr("walk * 31 + step * 7 + node")))
      .head().getLong(0)
    spark.catalog.clearCache()
    for (k <- Seq(2, 4)) {
      val t0 = System.nanoTime()
      val df = graft.rel.Graph.randomWalks(edges,
        steps = len, seedMod = 20, walksPerSeed = r, ckptEvery = k)
      val chk = df.agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.expr("walk * 31 + step * 7 + node")))
        .head().getLong(0)
      println(f"[walk-corpus] ckptEvery=$k%-12d R=$r len=$len " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%7.1f s " +
        s"checksum ${if (chk == ref) "EQUAL" else s"DIFFER $chk vs $ref"}")
      assert(chk == ref, s"ckptEvery=$k must be bit-identical")
      spark.catalog.clearCache()
    }
    leg("node2vec(1,2,4)")(graft.rel.Graph.node2vecWalks(edges,
      steps = len, seedMod = 20, walksPerSeed = r,
      wReturn = 1, wCommon = 2, wFar = 4))
    spark.stop()
  }
}
