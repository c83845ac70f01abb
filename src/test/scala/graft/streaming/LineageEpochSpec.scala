package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** The checkpoint-lineage pin on scrub-gated log targets (r12 ADVICE):
  * the ScrubRegistry replay gate assumes one monotonic batch-id
  * lineage per log, so a redeployed stream with a FRESH checkpoint
  * (batch ids restart at 0) pointed at a used target must fail loudly
  * at start — its genuinely new content would land inside old erasure
  * windows and be silently rewritten — while resuming the original
  * checkpoint keeps working.
  */
class LineageEpochSpec extends SparkSpec {
  import spark.implicits._

  private type Doc = (Long, String)

  test("index target: same checkpoint resumes; a fresh checkpoint " +
    "against the used target fails loudly at start") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("lineage").toString
    val target = s"$dir/index"; val ckptA = s"$dir/ckptA"
    val stream = MemoryStream[Doc]
    val df = stream.toDF().toDF("doc_id", "text")

    val q1 = StreamIndexCompact.start(df, target, ckptA, 4)
    try {
      stream.addData(Seq((1L, "alpha beta"), (2L, "beta gamma")))
      q1.processAllAvailable()
    } finally q1.stop()

    // resuming the SAME checkpoint lineage is the supported restart
    val q2 = StreamIndexCompact.start(df, target, ckptA, 4)
    try {
      stream.addData(Seq((3L, "delta")))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(StreamIndexCompact.postings(spark, target)
      .where("doc_id = 3").count() == 1L)

    // a REDEPLOY with a fresh checkpoint restarts batch ids at 0 —
    // refused before any batch can be mis-gated
    val e = intercept[IllegalStateException] {
      StreamIndexCompact.start(df, target, s"$dir/ckptB", 4)
    }
    assert(e.getMessage.contains("lineage"), e.getMessage)

    // the refusal is the protection the erasure design needs: the
    // fresh lineage's batch 0 would sit inside this registered window
    graft.sources.ScrubRegistry.append(spark, target, Seq(1L),
      graft.sources.ScrubRegistry.maxBatchId(spark, s"$target/log/postings"))
    assert(graft.sources.ScrubRegistry.gatedIds(spark, target, 0L)
      .contains(1L),
      "witness: batch id 0 of a fresh lineage lands inside the window")
  }

  test("merge-sink change log carries the same pin") {
    withRocksDb { // StreamMerge's TransformWithState needs RocksDB state
      implicit val sqlCtx = spark.sqlContext
      val dir = Files.createTempDirectory("lineage_merge").toString
      val target = s"$dir/table"; val log = s"$dir/log"
      val stream = MemoryStream[(Long, Long, String, String)]
      val df = stream.toDF().toDF("doc_id", "ver", "op", "text")

      val q1 = StreamMergeSink.start(df, target, s"$dir/ckptA", 4, Some(log))
      try {
        stream.addData(Seq((1L, 1L, "I", "hello")))
        q1.processAllAvailable()
      } finally q1.stop()

      val e = intercept[IllegalStateException] {
        StreamMergeSink.start(df, target, s"$dir/ckptB", 4, Some(log))
      }
      assert(e.getMessage.contains("lineage"), e.getMessage)
    }
  }
}
