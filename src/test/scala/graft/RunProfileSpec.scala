package graft

import org.apache.spark.sql.functions._

import graft.run.RunProfile

/** End-to-end spec for the governance profiling runner: every section's
  * sunk parquet must be IDENTICAL to its declared (oracle-gated) query
  * row, and the report's headline numbers must reconcile with the sunk
  * data — chaining the runner's artifact to DuckDB-checked results, the
  * RunMonitorSpec discipline.
  */
class RunProfileSpec extends SparkSpecBase {

  test("RunProfile sections ≡ declared rows; report reconciles with the sinks") {
    val out = java.nio.file.Files.createTempDirectory("profile").toString
    val report = RunProfile.run(spark, sfDir, out)

    Seq("data_profile", "data_constraints", "data_skew_report",
      "anon_kanon", "anon_ldiversity", "anon_tcloseness",
      "anon_dp_counts", "pii_stats", "pii_pseudonymize",
      "agg_benford").foreach { name =>
      val sunk = spark.read.parquet(s"$out/$name").collect().map(_.toSeq).toSet
      val declared = SparkEntry.queries(name)(spark, sfDir).collect().map(_.toSeq).toSet
      assert(sunk === declared, s"section $name must equal the declared row")
    }

    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/report.txt")) === report)
    // synthetic tables are clean → zero violations, no failing constraints
    assert(report.contains("constraint_violations: 0"))
    assert(report.contains("failing_constraints: none"))
    // privacy headlines carry both generalization levels
    assert(report.contains("nation_segment=") && report.contains("region_segment="))
    assert(report.contains("l_diversity: nation=") && report.contains("region="))
    assert(report.contains("t_closeness_max: nation="))
    assert(report.contains("pii_affected_records: "))
    // worst skew line names one of the three audited keys
    assert(Seq("l_orderkey", "l_partkey", "l_suppkey")
      .exists(k => report.contains(s"worst_skew: $k ")))
    // benford deviation reconciles with the sunk parquet
    val dev = spark.read.parquet(s"$out/agg_benford")
      .agg(max(abs(col("obs_share") - col("exp_share")))).head().getDouble(0)
    assert(report.contains(s"benford_max_abs_dev: ${math.floor(dev * 1e6 + 0.5) / 1e6}"))
  }
}
