package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities: the co-located-join lever for repeated
  * large-large joins at 100 TB.
  *
  * A sort-merge join between two huge fact tables shuffles both sides on
  * every query. Writing both bucketed (`bucketBy(n, key)` + `sortBy`) pays
  * that shuffle ONCE at ingest; every later equi-join on the bucket key
  * plans with zero Exchange on either side (asserted by BucketingSpec).
  * Bucket count is a cluster-sizing choice: at 100 TB, pick buckets ≈
  * total-cores × small-constant so each bucket file stays in the
  * 128-512 MB band.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table) // managed: lives in spark.sql.warehouse.dir

  /** Join two bucketed tables on their bucket key — shuffle-free when both
    * were written with `writeBucketed` and equal bucket counts. The merge
    * hint pins sort-merge (the large-large plan this utility exists for;
    * without it, harness-sized inputs would broadcast and skip the
    * bucketed scan entirely).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right), key)
}
