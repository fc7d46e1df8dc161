package graft

/** The driver's own smoke contract, as a spec: `SparkEntry.entry` must
  * return rows (> 0) on sf0.001 — the flagship two-stage FkNN pipeline.
  * Everything else the driver gates (queries + oracleSql) is exercised
  * through Verify; this pins the one entry point Verify does not call.
  */
class EntrySmokeSpec extends SparkSpecBase {
  test("SparkEntry.entry returns rows on sf0.001 (driver smoke contract)") {
    val out = SparkEntry.entry(spark)
    assert(out.columns.toSeq === Seq("q_id", "predicted"))
    assert(out.count() > 0)
  }
}
