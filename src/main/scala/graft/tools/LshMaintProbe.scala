package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drive the LSH maintenance trigger under planted token-distribution
  * drift (round 16, VERDICT r15 #4): bootstrap an index from the
  * document slice, append a TEMPLATE-BOILERPLATE drift batch — each
  * drifted doc is a long shared boilerplate prefix plus a real doc's
  * text, in mutated PAIRS (true near-dups at J ≈ 0.95) — and measure
  * `Dedup.lshBandedRecall` before/after. The boilerplate floods the
  * MinHash mins, so drifted pairs' band signatures collapse into a few
  * cap-hot buckets and the deployed banded search loses exactly the
  * pairs the drift brought; `RunIngest.maintainLsh` must fire and the
  * ×2-band rebuild must restore recall (a pair now misses only if
  * every one of 2b matching bands is hot). All hashes are md5/xxhash —
  * the numbers are deterministic, not sampled.
  *
  * usage: tools/run.sh graft.tools.LshMaintProbe [sfdir]
  */
object LshMaintProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Files.createTempDirectory("lshmaint").toString
    val base = graft.Tables.documents(spark, sfDir).filter(col("doc_id") < 500)
      .select(col("doc_id"), col("text"))
    graft.llm.Dedup.saveLshIndex(base, s"$out/index")
    def buckets(tag: String): Unit = {
      val top = spark.read.parquet(s"$out/index/sigs")
        .groupBy("sig").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc).limit(5).collect().map(_.getLong(1))
      println(s"[lshmaint] $tag top band buckets: ${top.mkString(", ")}")
    }
    buckets("pre-drift")
    def measure(tag: String, cap: Int): Unit = {
      val t0 = System.nanoTime()
      val (r, n, h) = graft.llm.Dedup.lshBandedRecall(spark, s"$out/index",
        sampleMod = 2, maxBandBucket = cap)
      println(f"[lshmaint] $tag%-28s recall=$r%.4f ($h of $n truth pairs) " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // between the base corpus's hottest band bucket (383 — the slice's
    // own boilerplate) and the drift batch's (≈1000): pre-drift runs
    // uncapped, drifted buckets go hot
    val cap = 512
    measure(s"pre-drift (cap=$cap)", cap)
    // drift batch: 200-token boilerplate + each base doc's text, two
    // mutated variants per doc (a true near-dup pair per base doc)
    val boiler = (1 to 200).map(i => s"tmplt$i").mkString(" ")
    val va = base.select((col("doc_id") + 10000).as("doc_id"),
      concat(lit(boiler + " "), col("text")).as("text"))
    val vb = base.select((col("doc_id") + 20000).as("doc_id"),
      concat(lit(boiler + " "), col("text"), lit(" zqx1 zqx2")).as("text"))
    graft.llm.Dedup.appendToLshIndex(va.unionByName(vb), s"$out/index")
    buckets("post-drift")
    measure(s"post-drift (cap=$cap)", cap)
    // the REJECTED fix, measured: re-banding cannot split a mutual
    // near-dup clique (its members share signatures at any banding) —
    // double the bands, measure, re-band back
    def reband(nh: Int): Unit = {
      val live = graft.core.Ckpt.truncate(
        graft.llm.Dedup.loadLshDocs(spark, s"$out/index"))
      graft.llm.Dedup.rebandLshIndex(live, s"$out/index", nh, 2)
      graft.core.Ckpt.release(live)
    }
    reband(16)
    measure(s"rebanded 16x2 (cap=$cap)", cap)
    reband(8)
    // the maintain ACTION: hot-bucket clique collapse + compaction
    val report = graft.run.RunIngest.maintainLsh(spark, out,
      minRecall = 0.9, sampleMod = 2, maxBandBucket = cap)
    println(report.linesIterator.map("[lshmaint] " + _).mkString("\n"))
    buckets("post-maintain")
    measure(s"post-maintain (cap=$cap)", cap)
    spark.stop()
  }
}
