package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Typed loaders for the driver-generated parquet tables.
  *
  * Parquet is self-describing; we deliberately do schema-on-read (no
  * inference pass) so Catalyst can push filters/column pruning into the
  * scan. See SURVEY.md §1.2 — the reference's KEEL text + external header
  * [LINEAGE] maps to parquet here.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `events.ts` has shipped as BOTH parquet timestamp[ns] and
    * timestamp[us] across harness data generations, so the loader is
    * schema-adaptive:
    *  - timestamp[ns]: Spark 4 refuses to read it as a timestamp
    *    (PARQUET_TYPE_ILLEGAL). Read it as nanos-long (legacy conf) and
    *    FLOOR to microseconds — exactly what DuckDB's parquet reader
    *    does to TIMESTAMP_NS. All-integer floor division
    *    ((ts - pmod(ts,1000)) div 1000): `div` alone truncates toward
    *    zero, which would differ from DuckDB by 1µs on pre-1970 nanos.
    *  - timestamp[us] without isAdjustedToUTC: Spark reads TIMESTAMP_NTZ;
    *    cast to TIMESTAMP — value-preserving under the UTC session
    *    timezone every entry point in this library pins, and it keeps
    *    every downstream `unix_micros`/`date_trunc`/window identical to
    *    what the nanos path produced (DuckDB reads the same file as its
    *    naive TIMESTAMP, same epoch micros).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
