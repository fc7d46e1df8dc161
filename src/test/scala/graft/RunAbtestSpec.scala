package graft

import graft.run.RunAbtest

/** End-to-end spec for the A/B analysis runner: every section's sunk
  * parquet must be IDENTICAL to its declared (oracle-gated) query row,
  * and the report's headline statistics must be the sunk values — the
  * RunProfileSpec discipline applied to the stats battery.
  */
class RunAbtestSpec extends SparkSpecBase {

  test("RunAbtest sections ≡ declared rows; report quotes the sunk statistics") {
    val out = java.nio.file.Files.createTempDirectory("abtest").toString
    val report = RunAbtest.run(spark, sfDir, out)

    val sections = Seq("stats_levene", "stats_anova", "stats_kruskal",
      "stats_ttest", "stats_mannwhitney", "stats_ztest_prop",
      "stats_effect_size", "events_cuped", "stats_sample_size",
      "stats_spearman", "stats_kendall", "stats_bootstrap_ci",
      "stats_permutation", "events_ab_assign")
    sections.foreach { name =>
      val sunk = spark.read.parquet(s"$out/$name").collect().map(_.toSeq).toSet
      val declared = SparkEntry.queries(name)(spark, sfDir).collect().map(_.toSeq).toSet
      assert(sunk === declared, s"section $name must equal the declared row")
    }

    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/report.txt")) === report)
    // headline lines quote each sunk single-row statistic verbatim
    def sunk1(name: String) = spark.read.parquet(s"$out/$name").head()
    assert(report.contains(s"levene_f: ${sunk1("stats_levene").getAs[Double]("f")}"))
    assert(report.contains(s"welch_t: ${sunk1("stats_ttest").getAs[Double]("t_welch")}"))
    assert(report.contains(s"mannwhitney_z: ${sunk1("stats_mannwhitney").getAs[Double]("z")}"))
    assert(report.contains(s"prop_z: ${sunk1("stats_ztest_prop").getAs[Double]("z")}"))
    assert(report.contains(s"spearman_rho: ${sunk1("stats_spearman").getAs[Double]("rho")}"))
    assert(report.contains(s"kendall_tau_b: ${sunk1("stats_kendall").getAs[Double]("tau_b")}"))
    val ci = sunk1("stats_bootstrap_ci")
    assert(ci.getAs[Double]("ci_lo") <= ci.getAs[Double]("mean") &&
      ci.getAs[Double]("mean") <= ci.getAs[Double]("ci_hi"))
    // every test line carries an explicit call
    assert(report.contains("REJECT") || report.contains("no-reject"))
    // A/A harness check: the hash split is outcome-blind, so the true
    // null holds — the A/A Mann-Whitney must NOT reject and the SRM
    // gate must pass (both deterministic on this fixed corpus)
    val aaZ = spark.read.parquet(s"$out/aa_mannwhitney")
      .head().getAs[Double]("z")
    assert(math.abs(aaZ) < 1.96, s"A/A z=$aaZ must not reject")
    assert(report.contains("(harness sound)") && report.contains("(split ok)"))

    // the BH adjusted-calls section reconciles with the declared
    // oracle-gated stats_fdr_bh row: same ranks, same calls
    val fdr = SparkEntry.queries("stats_fdr_bh")(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("test"),
        r.getAs[Boolean]("reject_bh"))).sortBy(_._1)
    assert(fdr.map(_._2).distinct.length === 6)
    fdr.foreach { case (rank, test, rejectBh) =>
      val line = report.linesIterator
        .find(l => l.trim.startsWith(s"$rank $test"))
        .getOrElse(fail(s"report must rank $test at $rank"))
      assert(line.contains(s"bh=${if (rejectBh) "REJECT" else "no-reject"}"),
        s"BH call for $test must match the declared row: $line")
    }
    assert(report.contains(s"bh_k: ${fdr.count(_._3)} of 6"))
    // round 12 (VERDICT r11 #8): the report states the correction's
    // exact scope — what is in the family and why each excluded line
    // class (assumption gate / estimation / harness diagnostic) stays out
    assert(report.contains("correction scope"))
    Seq("assumption gates", "ESTIMATION lines", "HARNESS diagnostics")
      .foreach(c => assert(report.contains(c), s"scope must name: $c"))
  }
}
