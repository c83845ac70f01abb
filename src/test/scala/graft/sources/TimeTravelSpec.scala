package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.streaming.StreamMergeSink

/** Time travel over the merge sink's change log: each historical batch
  * boundary reconstructs exactly (against a driver-side fold of the
  * prefix), the final as-of equals the live merge target, a replayed
  * batch leaves the log unchanged, and history reports per-batch
  * churn.
  */
class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private type Chg = (Long, Long, String, String)

  // three batches with overlap: b0 inserts, b1 updates half + inserts,
  // b2 deletes some + updates one — every as-of shape exercised
  private val b0: Seq[Chg] =
    (1L to 8L).map(i => (i, 1L, "I", s"a$i"))
  private val b1: Seq[Chg] =
    (1L to 4L).map(i => (i, 2L, "U", s"b$i")) :+ ((9L, 2L, "I", "a9"))
  private val b2: Seq[Chg] =
    Seq((2L, 3L, "D", ""), (9L, 3L, "D", ""), (5L, 3L, "U", "c5"))

  /** Driver-side truth: fold a prefix of batches, max version wins,
    * tombstones drop from the live view. */
  private def expected(batches: Seq[Seq[Chg]]): Map[Long, (Long, String)] =
    batches.flatten
      .groupBy(_._1).view
      .mapValues(_.maxBy(c => (c._2, c._3, c._4)))
      .collect { case (id, (_, v, op, t)) if op != "D" => id -> ((v, t)) }
      .toMap

  private def asOfMap(log: String, b: Long): Map[Long, (Long, String)] =
    TimeTravel.asOf(spark, log, b)
      .select("docId", "ver", "text").as[(Long, Long, String)]
      .collect().map { case (id, v, t) => id -> ((v, t)) }.toMap

  test("every batch boundary reconstructs; final as-of equals the live view") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val dir = Files.createTempDirectory("time_travel").toString
      val target = s"$dir/table"; val log = s"$dir/log"
      val stream = MemoryStream[Chg]
      val q = StreamMergeSink.start(
        stream.toDF().toDF("doc_id", "ver", "op", "text"),
        target, s"$dir/ckpt", 4, Some(log))
      try {
        Seq(b0, b1, b2).foreach { b =>
          stream.addData(b); q.processAllAvailable()
        }
      } finally q.stop()

      assert(asOfMap(log, 0L) == expected(Seq(b0)), "as of batch 0")
      assert(asOfMap(log, 1L) == expected(Seq(b0, b1)), "as of batch 1")
      assert(asOfMap(log, 2L) == expected(Seq(b0, b1, b2)), "as of batch 2")

      val live = StreamMergeSink.liveView(spark, target)
        .select("docId", "ver", "text").as[(Long, Long, String)]
        .collect().map { case (id, v, t) => id -> ((v, t)) }.toMap
      assert(asOfMap(log, 2L) == live,
        "latest as-of must equal the merge target's live view")

      // replaying a merged batch rewrites its own log partition with
      // identical rows — the log (and so every as-of) is unchanged
      val before = spark.read.parquet(log)
        .select("docId", "ver", "op", "text", "batch_id")
        .as[(Long, Long, String, String, Long)].collect().sorted.toSeq
      StreamMergeSink.mergeBatch(target, 4, Some(log))(
        b1.toDF("docId", "ver", "op", "text"), 1L)
      val after = spark.read.parquet(log)
        .select("docId", "ver", "op", "text", "batch_id")
        .as[(Long, Long, String, String, Long)].collect().sorted.toSeq
      assert(after == before, "replay duplicated or mutated log rows")

      val hist = TimeTravel.history(spark, log)
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(hist.map(_._1) == Seq(0L, 1L, 2L), "one history row per batch")
      assert(hist(0)._3 == 0L && hist(2)._3 == 2L,
        s"delete counts per batch: $hist")
    }
  }

  test("compaction preserves as-of at/above the floor, retires below, " +
      "and snapshot tombstones still suppress late upserts") {
    val dir = Files.createTempDirectory("tt_compact").toString
    val target = s"$dir/table"; val log = s"$dir/log"
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      StreamMergeSink.mergeBatch(target, 4, Some(log))(
        b.toDF("docId", "ver", "op", "text"), i.toLong)
    }
    val at1 = asOfMap(log, 1L); val at2 = asOfMap(log, 2L)
    TimeTravel.compact(spark, log, 1L)
    assert(asOfMap(log, 1L) == at1, "as-of at the compaction floor moved")
    assert(asOfMap(log, 2L) == at2, "as-of above the floor moved")
    assert(TimeTravel.asOf(spark, log, 0L).count() == 0L,
      "history below the floor must be retired")
    val parts = new java.io.File(log).list().toSet
    assert(!parts.contains("batch_id=0"), s"old partition survived: $parts")
    // idempotent re-run
    TimeTravel.compact(spark, log, 1L)
    assert(asOfMap(log, 2L) == at2, "re-compaction changed the log")
    // a snapshot that is ONLY tombstone for a key must keep suppressing
    // a late lower-version upsert after the original batches are gone
    TimeTravel.compact(spark, log, 2L)
    StreamMergeSink.mergeBatch(target, 4, Some(log))(
      Seq((2L, 1L, "U", "late")).toDF("docId", "ver", "op", "text"), 3L)
    assert(!asOfMap(log, 3L).contains(2L),
      "compacted tombstone failed to suppress a late low-version upsert")
  }

  test("compact clamps upTo to the newest real batch") {
    val dir = Files.createTempDirectory("tt_clamp").toString
    val target = s"$dir/table"; val log = s"$dir/log"
    Seq(b0, b1).zipWithIndex.foreach { case (b, i) =>
      StreamMergeSink.mergeBatch(target, 4, Some(log))(
        b.toDF("docId", "ver", "op", "text"), i.toLong)
    }
    val at1 = asOfMap(log, 1L)
    // a phantom upTo must not park the snapshot at a batch id that
    // never existed (asOf at the true latest would read empty)
    TimeTravel.compact(spark, log, 99L)
    assert(asOfMap(log, 1L) == at1,
      "as-of at the true latest batch must survive a phantom upTo")
    val parts = new java.io.File(log).list().filter(_.startsWith("batch_id=")).toSet
    assert(parts == Set("batch_id=1"), s"snapshot partition: $parts")
  }
}
