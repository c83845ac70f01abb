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
}
