package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet sink helpers: the write-side layout decisions that determine
  * read-side scale behavior (complement of `Bucketing`, which owns the
  * join-key layout).
  *
  *  - `writePartitioned`: hive-style directory partitioning — readers
  *    filtering on the partition columns prune whole directories before
  *    any file is opened (`PartitionFilters` in the scan, asserted in
  *    SinksSpec). Pick LOW-cardinality columns: each distinct tuple is a
  *    directory, and at 100 TB a high-cardinality partition key is the
  *    classic small-files self-inflict.
  *  - `compact`: the operational answer once small files exist (steady
  *    streaming drips, over-parallel writers): rewrite a directory into
  *    ceil(bytes / targetBytes) files. Coalesce-based (no shuffle — a
  *    compaction that shuffles 100 TB to avoid reading small files has
  *    negated its own point); pass `shuffle = true` only when the input
  *    is also badly skewed across files.
  */
object Sinks {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Rewrite `inPath` into `outPath` with ~`targetBytes`-sized files.
    * Returns (filesBefore, filesAfter). Operates on a FLAT parquet
    * directory (one compaction unit); for a hive-partitioned tree, run
    * it per leaf partition directory — compacting across partition
    * boundaries would destroy the layout `writePartitioned` built. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L * 1024 * 1024, shuffle: Boolean = false): (Int, Int) = {
    val fs = new Path(inPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // in-place compaction would have mode("overwrite") delete the very
    // directory the lazy read still has to scan — refuse loudly instead
    // of losing data (write to a sibling, then swap)
    // URI.normalize resolves "." / ".." segments makeQualified leaves
    // alone — "/data/y/../x" must compare equal to "/data/x"
    val inQ = fs.makeQualified(new Path(inPath)).toUri.normalize().toString
    val outQ = fs.makeQualified(new Path(outPath)).toUri.normalize().toString
    require(outQ != inQ && !outQ.startsWith(inQ + "/") && !inQ.startsWith(outQ + "/"),
      s"compact output $outQ must not overlap input $inQ")
    val files = fs.listStatus(new Path(inPath))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    val sized = if (shuffle) df.repartition(nOut) else df.coalesce(nOut)
    sized.write.mode("overwrite").parquet(outPath)
    val outFiles = fs.listStatus(new Path(outPath))
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    (files.length, outFiles)
  }

  /** Repair a table directory left by a CRASHED `swapIn` (round 13):
    * the swap's two renames leave exactly one recoverable intermediate
    * state — live missing with `.old_<name>` holding the data (crash
    * between the renames) — and one stale state — live present with a
    * leftover `.old_<name>` backup (crash before the final delete).
    * Restore the former, clear the latter. Callers run this BEFORE
    * reading the live dir or starting a new swap; on a healthy layout
    * it costs two existence probes.
    */
  def recoverSwap(fs: org.apache.hadoop.fs.FileSystem, parent: String,
      name: String): Unit = {
    val live = new Path(s"$parent/$name")
    val old = new Path(s"$parent/.old_$name")
    if (fs.exists(old)) {
      if (!fs.exists(live)) {
        require(fs.rename(old, live), s"swap recovery: rename $old -> $live failed")
      } else {
        fs.delete(old, true)
      }
    }
  }

  /** Atomically-enough swap of a freshly written `.compact_<name>`
    * sibling into the live `<name>` directory: live → `.old_<name>`,
    * sibling → live, backup deleted. EVERY rename's boolean result is
    * checked (round 13 review: Hadoop `FileSystem.rename` reports
    * failure by RETURNING FALSE, not throwing — an unchecked rename
    * after a crashed previous swap silently left the OLD table live
    * while the caller went on to clear its tombstones, resurrecting
    * retracted rows). Runs `recoverSwap` first so a stale backup from
    * a crashed swap can never make the renames fail silently.
    */
  def swapIn(fs: org.apache.hadoop.fs.FileSystem, parent: String,
      name: String): Unit = {
    recoverSwap(fs, parent, name)
    val live = new Path(s"$parent/$name")
    val fresh = new Path(s"$parent/.compact_$name")
    val old = new Path(s"$parent/.old_$name")
    require(fs.exists(fresh), s"swapIn: fresh table $fresh does not exist")
    require(fs.rename(live, old), s"swapIn: rename $live -> $old failed")
    require(fs.rename(fresh, live), s"swapIn: rename $fresh -> $live failed")
    fs.delete(old, true)
  }
}
