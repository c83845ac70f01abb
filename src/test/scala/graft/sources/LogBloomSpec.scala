package graft.sources

import java.nio.file.Files
import java.util.concurrent.atomic.LongAdder

import graft.SparkSpec
import graft.streaming.StreamMergeSink
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** The log scrubs' bloom pruning (r11 verdict item 7): a takedown
  * against a deep merge log reads only the candidate partitions the
  * per-batch blooms cannot clear — pinned with task input records,
  * the same instrument as the Z-order and BucketMeta pins — while the
  * scrub's result stays byte-identical to the unpruned form, and a
  * batch without a bloom (legacy history, torn write) safely stays a
  * candidate.
  */
class LogBloomSpec extends SparkSpec {
  import spark.implicits._

  private class InputRecords extends SparkListener {
    val records = new LongAdder
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (e.taskMetrics != null) records.add(e.taskMetrics.inputMetrics.recordsRead)
    def settle(): Long = {
      var prev = -1L; var cur = records.sum(); var i = 0
      while (cur != prev && i < 50) {
        prev = cur; Thread.sleep(50); cur = records.sum(); i += 1
      }
      cur
    }
  }

  private def recordsDuring(body: => Unit): Long = {
    val l = new InputRecords
    spark.sparkContext.addSparkListener(l)
    try { body; l.settle() }
    finally spark.sparkContext.removeSparkListener(l)
  }

  /** A 5-batch merge log, 40 docs per batch, disjoint id ranges. */
  private def buildLog(tag: String): (String, String) = {
    val dir = Files.createTempDirectory(tag).toString
    val target = s"$dir/merged"; val log = s"$dir/log"
    (0L until 5L).foreach { b =>
      val rows = (0L until 40L)
        .map(i => (b * 1000 + i, 1L, "U", s"text of doc ${b * 1000 + i}"))
        .toDF("docId", "ver", "op", "text")
      StreamMergeSink.mergeBatch(target, 8, Some(log))(rows, b)
    }
    (target, log)
  }

  test("scrub reads only the bloom-candidate partitions; result equals " +
    "the erasure contract; bloom-less batches stay candidates") {
    val (_, log) = buildLog("logbloom")
    val victim = 2007L // lives in batch 2 only
    assert(LogBloom.candidateBatches(spark, log, Seq(victim)) == Seq(2L),
      "the blooms must clear every batch but the victim's")

    // the records-read pin: every pass over data is batch 2's 40 rows
    // (discovery scan, rewrite re-read, checkpoint materialize + its
    // read-back at write — ≤4×40; measured 140). The unpruned scrub's
    // discovery alone read the full 200-row log, so anything under 200
    // proves the full scan is gone; 160 pins the per-candidate scaling.
    val read = recordsDuring(
      TakedownApply.scrubMergeLog(spark, log, Seq(victim)))
    assert(read <= 160L, s"scrub must read only batch 2's partition " +
      s"(<=4 passes x 40 rows), got $read")

    // erasure contract unchanged: the victim reads as a blanked
    // tombstone, every other row is byte-unchanged
    val after = spark.read.parquet(log)
    val v = after.where(col("docId") === victim).collect()
    assert(v.length == 1 && v.head.getAs[String]("op") == "D" &&
      v.head.getAs[String]("text") == "", "victim must be tombstoned")
    assert(after.where(col("docId") =!= victim &&
      (col("op") =!= "U" || !col("text").startsWith("text of"))).count() == 0L,
      "unflagged history must be byte-unchanged")

    // a doc in NO batch: every bloom clears, the scrub is a pure no-op
    assert(LogBloom.candidateBatches(spark, log, Seq(99999L)).isEmpty)
    val none = recordsDuring(
      TakedownApply.scrubMergeLog(spark, log, Seq(99999L)))
    assert(none == 0L, s"an all-clear takedown must read no rows, got $none")

    // legacy/torn bloom: batch 4's certificate gone — it must rejoin
    // the candidates (safety) while cleared batches stay pruned
    val fs = new org.apache.hadoop.fs.Path(log)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$log/_blooms/4"), false))
    assert(LogBloom.candidateBatches(spark, log, Seq(victim))
      .sorted == Seq(2L, 4L),
      "a bloom-less batch must stay a candidate")
    // and a replayed batch write repairs the missing bloom (idempotent)
    val rows4 = (0L until 40L)
      .map(i => (4000L + i, 1L, "U", s"text of doc ${4000 + i}"))
      .toDF("docId", "ver", "op", "text")
    StreamMergeSink.mergeBatch(s"${log}_unused", 8, Some(log))(rows4, 4L)
    assert(LogBloom.candidateBatches(spark, log, Seq(victim)) == Seq(2L),
      "the replayed batch must republish its bloom")
  }

  test("merge log: a checkpoint replay of a scrubbed batch cannot " +
    "resurrect erased content; a post-takedown re-add keeps its history") {
    val (target, log) = buildLog("logreplay")
    val victim = 2007L
    TakedownApply.scrubMergeLog(spark, log, Seq(victim))
    // simulate the checkpoint replay: the ORIGINAL pre-scrub batch 2
    // rows arrive again and dynamic overwrite rewrites the partition —
    // without the registry gate this resurrects the erased text with
    // nothing left to re-scrub (the scrub ran at flag time)
    val rows2 = (0L until 40L)
      .map(i => (2000L + i, 1L, "U", s"text of doc ${2000 + i}"))
      .toDF("docId", "ver", "op", "text")
    StreamMergeSink.mergeBatch(s"${target}_replay", 8, Some(log))(rows2, 2L)
    val v = spark.read.parquet(log).where(col("docId") === victim).collect()
    assert(v.length == 1 && v.head.getAs[String]("op") == "D" &&
      v.head.getAs[String]("text") == "",
      "the replayed victim row must stay in erasure form")
    assert(spark.read.parquet(log)
      .where(col("batch_id") === 2L && col("docId") =!= victim &&
        !col("text").startsWith("text of")).count() == 0L,
      "the replay must keep every unflagged row byte-faithful")
    // erasure is retroactive, never prospective: a genuinely NEW batch
    // re-adding the doc id (fresh content, fresh consent) passes the
    // gate and its history survives
    StreamMergeSink.mergeBatch(s"${target}_readd", 8, Some(log))(
      Seq((victim, 2L, "U", "readded content"))
        .toDF("docId", "ver", "op", "text"), 7L)
    val readd = spark.read.parquet(log)
      .where(col("batch_id") === 7L && col("docId") === victim).collect()
    assert(readd.length == 1 && readd.head.getAs[String]("text") ==
      "readded content", "a post-takedown re-add must keep its content")
  }

  test("index: a checkpoint replay of a scrubbed batch re-inserts " +
    "nothing into compacted buckets or log partitions; a re-add indexes") {
    import graft.streaming.StreamIndexCompact
    val dir = Files.createTempDirectory("idxreplay").toString
    val target = s"$dir/index"
    def batchOf(b: Long) = (0L until 10L)
      .map(i => (b * 100 + i, s"term${b}x$i shared tok$i"))
      .toDF("doc_id", "text")
    (0L to 2L).foreach(b => StreamIndexCompact.compactBatch(target, 4)(batchOf(b), b))
    val victim = 105L // batch 1
    TakedownApply.scrubIndex(spark, target, Seq(victim))
    TakedownApply.scrubIndexLog(spark, target, Seq(victim))
    def victimRows = Seq("postings", "doclens", "log/postings", "log/doclens")
      .map(sub => spark.read.parquet(s"$target/$sub")
        .where(col("doc_id") === victim).count()).sum
    assert(victimRows == 0L, "witness: the scrub erased the victim")
    // replay batch 1 (checkpoint replay of pre-scrub rows)
    StreamIndexCompact.compactBatch(target, 4)(batchOf(1L), 1L)
    assert(victimRows == 0L,
      "a replayed pre-scrub batch must not re-insert the victim anywhere")
    assert(spark.read.parquet(s"$target/doclens")
      .where(col("doc_id") >= 100L && col("doc_id") < 110L).count() == 9L,
      "the replay must keep the batch's other docs indexed")
    // a NEW batch re-adds the doc id: prospective writes are untouched
    StreamIndexCompact.compactBatch(target, 4)(
      Seq((victim, "fresh readded text")).toDF("doc_id", "text"), 9L)
    assert(spark.read.parquet(s"$target/postings")
      .where(col("doc_id") === victim && col("t") === "readded").count() == 1L,
      "a post-takedown re-add must index normally")
    assert(spark.read.parquet(s"$target/log/doclens")
      .where(col("batch_id") === 9L && col("doc_id") === victim).count() == 1L)
  }
}
