package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Ckpt

/** Round-17 A/B (VERDICT-r15/r16 handoff #3): the heavy-group guard in
  * `coOrderEdgesFrom` is a `count OVER (PARTITION BY ok)` window — at
  * cluster scale the agg+join form avoids the per-partition sort the
  * window pays (guide §2.3), but the r15 nearDups cap measured the
  * window form FASTER at gate scale. Measure BOTH forms on the real
  * sf0.1 membership and on a 10× shifted-copy scale-up, asserting the
  * two produce identical edge sets. Dev utility.
  */
object CoGuardProbe {
  private val MaxPerGroup = 1000

  /** The agg+join variant of the guard: per-group counts as a keyed
    * aggregate (map-side partials) joined back on the SAME ok key the
    * pair join shuffles by.
    */
  private def aggJoinEdges(membership: DataFrame): DataFrame = {
    val li0 = membership.select(col("ok"), col("pk")).distinct()
    val counts = li0.groupBy(col("ok")).agg(count(lit(1)).as("nparts"))
    val li = li0.join(counts, "ok")
      .select(col("ok"),
        when(col("nparts") > MaxPerGroup,
          raise_error(lit("group over maxPerGroup")))
          .otherwise(col("pk")).as("pk"))
    li.select(col("ok"), col("pk").as("p1"))
      .join(li.select(col("ok"), col("pk").as("p2")), "ok")
      .filter(col("p1") < col("p2"))
      .select(col("p1"), col("p2"))
      .distinct()
  }

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
    def membership1x = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") >= 25)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    // 10× scale-up: ten disjoint shifted copies — same group-size
    // distribution, 10× the groups (the pair expansion scales linearly
    // in groups, so this isolates the guard's cost, not the quadratic)
    def membership10x = membership1x
      .crossJoin(spark.range(10).select(col("id").as("rep")))
      .select((col("ok") * 10 + col("rep")).as("ok"), col("pk"))
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)).as("n"),
        expr("bit_xor(xxhash64(p1, p2))").as("h")).head()
      (r.getAs[Long]("n"), r.getAs[Long]("h"))
    }
    def time(label: String)(body: => (Long, Long)): (Long, Long) = {
      var last = (0L, 0L)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        last = body
        println(f"[coguard] $label run$i wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
          s"n=${last._1} h=${last._2}")
      }
      last
    }
    // warmup both shapes (codegen)
    checksum(graft.rel.Graph.coOrderEdgesFrom(
      graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
        .filter(col("l_quantity") >= 25)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))))
    checksum(aggJoinEdges(graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .filter(col("l_quantity") >= 25)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))))
    val w1 = time("window 1x") { checksum(graft.rel.Graph.coOrderEdgesFrom(membership1x)) }
    val a1 = time("aggjoin 1x") { checksum(aggJoinEdges(membership1x)) }
    assert(w1 == a1, s"1x mismatch: $w1 vs $a1")
    val w10 = time("window 10x") { checksum(graft.rel.Graph.coOrderEdgesFrom(membership10x)) }
    val a10 = time("aggjoin 10x") { checksum(aggJoinEdges(membership10x)) }
    assert(w10 == a10, s"10x mismatch: $w10 vs $a10")
    println("[coguard] checksums equal at both scales")
    spark.stop()
  }
}
