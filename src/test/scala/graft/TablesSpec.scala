package graft

import org.apache.spark.sql.functions._

/** Loader edge cases: the events ns→µs conversion must FLOOR (DuckDB's
  * TIMESTAMP_NS→µs behavior), not truncate toward zero — they differ by
  * 1 µs on pre-1970 nanos.
  */
class TablesSpec extends SparkSpecBase {

  test("events ts ns→µs conversion floors for negative (pre-1970) nanos") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evts").toString
    // ts as raw nanos-long, the shape Tables.events reads post-conf:
    //  -1500 ns → floor(-1.5 µs) = -2 µs   (truncation would give -1)
    //   1500 ns → 1 µs; exact multiples stay exact
    Seq((1L, -1500L), (2L, 1500L), (3L, -2000000L), (4L, 0L))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> -2L, 2L -> 1L, 3L -> -2000L, 4L -> 0L))
  }
}
