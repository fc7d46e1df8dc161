package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{Distance, Knn}
import graft.llm.AnnSearch

/** Scale experiment for the round-8 spatial + binary-ANN rows:
  *
  *  1. `join_spatial_grid` core at 10⁵-10⁶ hash-seeded points vs the
  *     naive cross join at a size where the naive form is still
  *     runnable — the claim under test is that grid pair count is
  *     Σ|cell|·9·avg-cell, not n², and wall time scales with OUTPUT,
  *     not with n².
  *  2. `ann_hamming` core (8-byte codes, popcount(xor)) vs the exact
  *     float scan (256-byte vectors, fused cosine) over the same
  *     corpus — the claim under test is the memory-bandwidth ratio:
  *     the code scan should beat the float scan by a large constant at
  *     equal pair counts.
  *
  * usage: tools/run.sh graft.tools.GeoAnnProbe [nPtsSmall] [nPtsBig] [nVecs] [nQ] [dim]
  * Deterministic (hash-seeded), no RNG state. `dim` sizes the FLOAT
  * vectors only (codes stay 64-bit — at dim > 64 the sign sketch uses
  * the leading 64 coordinates, which is all the scan-rate comparison
  * needs).
  */
object GeoAnnProbe {
  def main(args: Array[String]): Unit = {
    val nSmall = if (args.nonEmpty) args(0).toInt else 20000
    val nBig = if (args.length > 1) args(1).toInt else 1000000
    val nVecs = if (args.length > 2) args(2).toInt else 200000
    val nQ = if (args.length > 3) args(3).toInt else 100
    val dimArg = if (args.length > 4) args(4).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.TopKAgg.tune(spark)

    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[geoann] $what%-46s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // ---- leg 1: spatial grid vs naive ----------------------------------
    // points on a 10000 × 4450 plane (the declared row's extents), ~3
    // points per 100×100 cell at n = 20k scaled densities
    def pts(n: Int) = spark.range(n).select(col("id"),
      (abs(hash(col("id"))) % 1000000 / 100.0).as("x"),
      (abs(hash(col("id") + 7)) % 445000 / 100.0).as("y"))

    val gSmall = time(s"grid join  n=$nSmall")(
      graft.rel.Queries.spatialGridJoinPts(pts(nSmall), 100.0).count())
    val naive = time(s"naive join n=$nSmall (${nSmall.toLong * nSmall / 2} pairs)") {
      val a = pts(nSmall).select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"))
      val b = pts(nSmall).select(col("id").as("b_id"), col("x").as("bx"), col("y").as("by"))
      a.crossJoin(b).filter(col("a_id") < col("b_id"))
        .filter(sqrt((col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by"))) <= 100.0)
        .count()
    }
    assert(gSmall == naive, s"grid $gSmall != naive $naive")
    println(s"[geoann] grid == naive at n=$nSmall: $gSmall pairs")
    val gBig = time(s"grid join  n=$nBig")(
      graft.rel.Queries.spatialGridJoinPts(pts(nBig), 100.0).count())
    println(s"[geoann] n=$nBig grid pairs: $gBig (naive would be ${nBig.toLong * nBig / 2})")

    // ---- leg 2: hamming code scan vs float scan ------------------------
    // the production shape: codes are BUILT ONCE and stored; the scan
    // reads the 16-byte-per-row code table, never the float vectors.
    // (An inline-derived code scan reads every float anyway and is
    // parquet-IO-bound like the float scan — measured no faster.)
    val dim = dimArg
    val vecs = spark.range(nVecs).select(col("id").as("vec_id"),
      expr(s"transform(sequence(1, $dim), j -> " +
        "cast(hash(id * 64 + j) AS double) / 2147483647e0)").as("v"))
    vecs.write.mode("overwrite").parquet("/tmp/geoann_vecs")
    val e = spark.read.parquet("/tmp/geoann_vecs")
    time(s"code table build n=$nVecs")(
      AnnSearch.signCodes(e).write.mode("overwrite").parquet("/tmp/geoann_codes"))
    val c = spark.read.parquet("/tmp/geoann_codes")
    val q = e.filter(col("vec_id") < nQ)
    val t = e.filter(col("vec_id") >= nQ)
    val qc = c.filter(col("vec_id") < nQ)
    val tc = c.filter(col("vec_id") >= nQ)
    // warm both paths once at 1/10 queries, then measure
    AnnSearch.hammingTopKCodes(qc.limit(nQ / 10), tc, 3).count()
    Knn.knn(q.limit(nQ / 10), t, k = 3, dist = AnnSearch.cosineDist).count()
    val hPairs = nQ.toLong * (nVecs - nQ)
    time(s"hamming code scan  $nQ q × ${nVecs - nQ} codes ($hPairs pairs)")(
      AnnSearch.hammingTopKCodes(qc, tc, 3).count())
    time(s"float cosine scan  $nQ q × ${nVecs - nQ} vecs  ($hPairs pairs)")(
      Knn.knn(q, t, k = 3, dist = AnnSearch.cosineDist).count())

    spark.stop()
  }
}
