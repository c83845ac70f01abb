package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** CDC merge-to-parquet: the change log streamed across a checkpointed
  * RESTART must leave on-disk state equal to batch q122's apply —
  * upserts present at their final version, deletes invisible in the
  * live view but present as versioned tombstones — and a manual replay
  * of an already-merged batch must leave the target unchanged
  * (at-least-once safety).
  */
class StreamMergeSinkSpec extends SparkSpec {
  import spark.implicits._

  private type Chg = (Long, Long, String, String)

  /** q122's deterministic change log (StreamMergeSpec's construction). */
  private lazy val changes: Seq[Chg] = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val off = base.map(_._1).max + 1
    base.flatMap { case (id, text) =>
      Seq(
        if (id % 3 == 0) Some((id, 1L, "U", s"v1 $text")) else None,
        if (id % 2 == 0) Some((id, 2L, "U", s"v2 $text")) else None,
        if (id % 5 == 0) Some((id + off, 2L, "I", s"new $text")) else None,
        if (id % 7 == 0) Some((id, 3L, "D", "")) else None).flatten
    }
  }

  test("restart mid-log, then replay a batch: disk equals batch q122") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val dir = Files.createTempDirectory("merge_sink").toString
      val target = s"$dir/table"; val ckpt = s"$dir/ckpt"
      val stream = MemoryStream[Chg]
      def start() = StreamMergeSink.start(
        stream.toDF().toDF("doc_id", "ver", "op", "text"), target, ckpt, 16)

      val (first, second) = changes.splitAt(changes.size / 2)
      val q1 = start()
      try { stream.addData(first); q1.processAllAvailable() } finally q1.stop()

      // restart from the checkpoint, stream the rest
      val q2 = start()
      try { stream.addData(second); q2.processAllAvailable() } finally q2.stop()

      // batch q122 on the same corpus; 'K' rows are untouched base keys
      // the change stream never saw — the merge target holds CHANGED
      // keys only, so compare against the non-K slice
      val expected = graft.queries.OpsQueries.mergeUpsert(spark, sfDir)
        .where("last_op <> 'K'").collect()
        .map(r => r.getLong(0) -> ((r.getLong(3), r.getString(1)))).toMap
      def live() = StreamMergeSink.liveView(spark, target).collect()
        .map(r => r.getAs[Long]("docId") ->
          ((r.getAs[Long]("ver"), r.getAs[String]("text")))).toMap
      assert(live() == expected,
        "on-disk live view differs from batch q122 after restart")

      // deleted keys: gone from the live view, present as tombstones
      val tombs = spark.read.parquet(target).where("op = 'D'").count()
      assert(tombs > 0, "expected versioned tombstones on disk")

      // at-least-once: replay an already-merged prefix as a raw batch of
      // CURRENT rows (what a redelivered micro-batch carries) — no change
      val replay = first.map { case (id, v, o, t) => (id, v, o, t) }
        .toDF("docId", "ver", "op", "text")
        .groupBy("docId").agg(
          org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.struct($"ver", $"op", $"text")).as("m"))
        .select($"docId", $"m.ver".as("ver"), $"m.op".as("op"), $"m.text".as("text"))
      StreamMergeSink.mergeBatch(target, 16)(replay, 999L)
      assert(live() == expected, "replaying a merged batch changed the target")
    }
  }

  test("missing target initializes; a corrupt target throws, not resets") {
    import org.apache.spark.sql.functions.max
    val dir = Files.createTempDirectory("merge_sink_guard").toString
    val batch = Seq((1L, 1L, "I", "a"), (2L, 1L, "I", "b"))
      .toDF("docId", "ver", "op", "text")
    // absent target: the existence check takes the first-batch path
    StreamMergeSink.mergeBatch(s"$dir/fresh", 4)(batch, 0L)
    assert(StreamMergeSink.liveView(spark, s"$dir/fresh").count() == 2)

    // present-but-corrupt target (not parquet): the old catch-all would
    // have treated this as "no target yet" and OVERWRITTEN it from one
    // batch; r7 verdict item 7 demands it fail loudly instead
    val corrupt = s"$dir/corrupt"
    Files.createDirectories(java.nio.file.Paths.get(corrupt))
    Files.writeString(java.nio.file.Paths.get(corrupt, "part-0.parquet"),
      "this is not parquet")
    val thrown = intercept[Throwable] {
      StreamMergeSink.mergeBatch(corrupt, 4)(
        batch, 1L)
      // force the lazy read if the write path didn't already
      spark.read.parquet(corrupt).collect()
    }
    assert(thrown != null)
    assert(Files.readString(
      java.nio.file.Paths.get(corrupt, "part-0.parquet"))
      == "this is not parquet",
      "a failing merge must not have clobbered the corrupt target")
  }
}
