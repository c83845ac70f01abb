package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared "rewrite touched partitions, delete emptied ones" dance
  * (r8 verdict item 7 / ROADMAP item 5): four components — index
  * scrub, index-log scrub, the ANN code-index scrub, time-travel
  * compaction — each carried a private copy with schema-specific
  * drift. The two invariants live HERE, once:
  *
  *  1. **Touched-only work.** Only partitions holding rows matched by
  *     the touch predicate are read and rewritten — work scales with
  *     touched partitions, never the table.
  *  2. **Emptied partitions die.** Dynamic partition overwrite only
  *     replaces partitions PRESENT in the written frame; a partition
  *     whose every row was dropped writes no rows, so its old files
  *     must be deleted explicitly or the "removed" rows keep serving.
  *
  * Crash-safe ordering: rewrites land first (localCheckpoint
  * materializes the survivors before their source files are
  * replaced), deletions after — a crash in between leaves extra rows
  * whose rewrite is idempotent, and a re-run completes the deletion.
  */
object PartitionScrub {

  /** Rewrite every partition of `path` that holds a row matching
    * `touch`, replacing its rows with `rewrite(rows)`; partitions the
    * rewrite empties are deleted. `partitionCol` must survive the
    * rewrite (it is re-cast to long — partition-column inference reads
    * hive dirs back as INT). No-op when the target does not exist or
    * nothing is touched. */
  def rewriteTouched(s: SparkSession, path: String, partitionCol: String,
                     touch: Column)
                    (rewrite: DataFrame => DataFrame): Unit = {
    val tgtPath = new org.apache.hadoop.fs.Path(path)
    val fs = tgtPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(tgtPath)) return
    val all = s.read.parquet(path)
    val touched = all.where(touch)
      .select(col(partitionCol).cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq
    rewriteParts(s, path, partitionCol, touched)(rewrite)
  }

  /** [[rewriteTouched]] when the caller already KNOWS the touched
    * partition values — the partition function is computable from the
    * touch set driver-side (e.g. `bucket = pmod(key, b)` over an
    * explicit key list), so the store-wide scan that discovers touched
    * partitions is skipped entirely and the rewrite reads only the
    * named partitions. Values naming absent partitions are harmless:
    * they select no rows and their delete is a no-op. */
  def rewriteKnown(s: SparkSession, path: String, partitionCol: String,
                   touched: Seq[Long])
                  (rewrite: DataFrame => DataFrame): Unit = {
    val tgtPath = new org.apache.hadoop.fs.Path(path)
    val fs = tgtPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(tgtPath)) return
    rewriteParts(s, path, partitionCol, touched.distinct)(rewrite)
  }

  private def rewriteParts(s: SparkSession, path: String,
                           partitionCol: String, touched: Seq[Long])
                          (rewrite: DataFrame => DataFrame): Unit = {
    if (touched.isEmpty) return
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val all = s.read.parquet(path)
    val remaining0 = rewrite(all.where(col(partitionCol).isin(touched: _*)))
    // normalize: partition column re-cast to long, original position
    // (partition-column inference reads hive dirs back as INT)
    val remaining = remaining0.select(remaining0.columns.map { c =>
      if (c == partitionCol) col(c).cast("long").as(c) else col(c)
    }: _*).localCheckpoint()
    remaining.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .mode("overwrite")
      .parquet(path)
    val kept = remaining.select(col(partitionCol)).distinct()
      .collect().map(_.getLong(0)).toSet
    touched.filterNot(kept).foreach { p =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/$partitionCol=$p"), true)
    }
  }

  /** The drop-rows form: partitions holding `doomed` rows are
    * rewritten without them (most scrubs are this shape). */
  def dropRows(s: SparkSession, path: String, partitionCol: String,
               doomed: Column): Unit =
    rewriteTouched(s, path, partitionCol, doomed)(_.where(!doomed))

  /** Delete whole partitions of `path` whose value satisfies `pred` —
    * compaction's retire-the-prefix half. */
  def deletePartitions(s: SparkSession, path: String, partitionCol: String,
                       pred: Long => Boolean): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    fs.listStatus(root).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith(s"$partitionCol=") &&
          pred(name.stripPrefix(s"$partitionCol=").toLong))
        fs.delete(st.getPath, true)
    }
  }
}
