package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERSION AS OF reads over the change log [[graft.streaming
  * .StreamMergeSink]] appends beside its merge target — the lakehouse
  * time-travel surface (q169 is the batch-registered, oracle-checked
  * twin of the reconstruction arithmetic). The log keeps one row per
  * (batch, touched key): the key's merged current state as of that
  * batch, partitioned by batch_id with replay-idempotent dynamic
  * overwrite, so the log is append-only in effect yet safe under
  * at-least-once delivery.
  *
  * Reconstruction rule (q122's argmax, version-bounded): a key's state
  * as of batch B is its max-(ver, op, text) row among log rows with
  * batch_id ≤ B; tombstones suppress the key from the live view but
  * participate in the argmax, so a late low-version upsert cannot
  * resurrect a deleted key.
  *
  * Scale shape: `batch_id ≤ B` is a PARTITION filter — later batches'
  * files are pruned, never read; the argmax is one partial
  * aggregation keyed on docId (no per-key sort window). Log size
  * grows with total churn, not table size; compaction of old batches
  * into a checkpoint snapshot is the q120 janitor posture and out of
  * scope here.
  */
object TimeTravel {

  /** The table's LIVE rows as of log batch `batchId` (inclusive). */
  def asOf(s: SparkSession, log: String, batchId: Long): DataFrame =
    s.read.parquet(log).where(col("batch_id") <= batchId)
      .groupBy(col("docId"))
      .agg(max(struct(col("ver"), col("op"), col("text"))).as("m"))
      .select(col("docId"), col("m.ver").as("ver"), col("m.op").as("op"),
        col("m.text").as("text"))
      .where(col("op") =!= "D")

  /** Compact every log batch ≤ `upTo` into one snapshot partition at
    * batch_id = `upTo`: the per-key argmax over the prefix — INCLUDING
    * tombstones, which must keep suppressing late low-version upserts
    * after their constituent batches are gone. Every `asOf(B ≥ upTo)`
    * is unchanged (the snapshot rows ARE the prefix's argmax, and
    * argmax over duplicated rows is idempotent); history below `upTo`
    * is retired — `asOf(B < upTo)` becomes empty, the documented
    * retention floor (q120's janitor posture: bounding log size is an
    * operator's explicit call).
    *
    * Crash-safe ordering: the snapshot partition is (over)written
    * FIRST, old partitions deleted after — a crash in between leaves
    * redundant rows whose argmax is identical, and a re-run completes
    * the deletion. */
  def compact(s: SparkSession, log: String, upTo: Long): Unit = {
    // an upTo beyond the max logged batch would delete every real
    // partition and park the snapshot at a batch id that never
    // existed — asOf at the true latest batch would silently read
    // empty. Clamp to the newest real batch instead.
    // cast: a partition column read back from disk infers as int
    val maxBatch = s.read.parquet(log)
      .agg(max(col("batch_id")).cast("long")).head.getLong(0)
    val upTo0 = math.min(upTo, maxBatch)
    compactClamped(s, log, upTo0)
  }

  private def compactClamped(s: SparkSession, log: String, upTo: Long): Unit = {
    val snap = s.read.parquet(log).where(col("batch_id") <= upTo)
      .groupBy(col("docId"))
      .agg(max(struct(col("ver"), col("op"), col("text"))).as("m"))
      .select(col("docId"), col("m.ver").as("ver"), col("m.op").as("op"),
        col("m.text").as("text"))
      .withColumn("batch_id", lit(upTo))
      .localCheckpoint() // materialize before overwriting files it reads
    snap.write.option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").mode("overwrite").parquet(log)
    PartitionScrub.deletePartitions(s, log, "batch_id", _ < upTo)
  }

  /** DESCRIBE HISTORY: per batch, how many keys it touched and how —
    * the audit row a rollback decision reads. */
  def history(s: SparkSession, log: String): DataFrame =
    s.read.parquet(log)
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_changes"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deletes"),
        max(col("ver")).as("max_ver"))
      .orderBy(col("batch_id"))
}
