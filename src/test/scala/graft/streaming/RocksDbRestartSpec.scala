package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.StreamDedup.Doc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Restart recovery on the RocksDB state store provider (r6 verdict
  * item 3): the 100 TB-state posture is RocksDB + checkpoint, and the
  * property that matters operationally is that keyed state SURVIVES a
  * query restart — a dedup filter that forgets its digests on failover
  * re-admits every document the moment an executor dies.
  *
  * Both keyed-state APIs are covered, because they recover through
  * different store layouts: `flatMapGroupsWithState` (StreamDedup) and
  * `transformWithState` (StreamProfile, whose KMV sketch + counters
  * must resume, not reset). Parity-under-RocksDB for the rest of the
  * family is asserted in each component's own spec (they all run on
  * the provider via SparkSpec.withRocksDb).
  */
class RocksDbRestartSpec extends SparkSpec {
  import spark.implicits._

  test("StreamDedup digests survive a checkpointed restart (fMGWS)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      // file sink, not memory: the memory sink refuses checkpoint
      // recovery, and recovery is the property under test
      val base = Files.createTempDirectory("rocks_dedup").toString
      val ckpt = s"$base/ckpt"; val out = s"$base/out"
      val stream = MemoryStream[Doc]
      def start() = StreamDedup.firstSeen(stream.toDF())
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      val q1 = start()
      try {
        stream.addData(Doc(1, "alpha"), Doc(2, "beta"))
        q1.processAllAvailable()
      } finally q1.stop()

      // restart from the same checkpoint: "alpha" must STILL be a
      // duplicate — only a recovered RocksDB store knows that
      val q2 = start()
      try {
        stream.addData(Doc(9, "alpha"), Doc(5, "gamma"))
        q2.processAllAvailable()
        val post = spark.read.parquet(out)
          .as[StreamDedup.Deduped].collect().map(_.docId).toSet
        assert(post == Set(1L, 2L, 5L),
          s"expected pre-restart survivors {1,2} + fresh {5}, got $post")
      } finally q2.stop()
    }
  }

  private type Ev = (Long, Long, String, Double, String)

  test("StreamProfile counters and sketch resume across restart (tWS)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val events = spark.read.parquet(s"$sfDir/events.parquet")
        .selectExpr("event_id", "user_id", "event_type", "value", "props")
        .as[Ev].collect().toSeq
      val (first, second) = events.splitAt(events.size / 2)

      val base = Files.createTempDirectory("rocks_prof").toString
      val ckpt = s"$base/ckpt"; val out = s"$base/out"
      val stream = MemoryStream[Ev]
      def start() = StreamProfile(stream.toDF()
          .toDF("event_id", "user_id", "event_type", "value", "props"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()

      val q1 = start()
      try { stream.addData(first); q1.processAllAvailable() } finally q1.stop()

      val q2 = start()
      try {
        stream.addData(second)
        q2.processAllAvailable()
        // post-restart snapshot rows: n per column must be the FULL
        // event count — a reset store would restart counting at
        // |second| and prove recovery failed
        val n = spark.read.parquet(out)
          .as[(String, Long, Long, Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        n.foreach { case (colName, cnt) =>
          assert(cnt == events.size.toLong,
            s"$colName counted $cnt rows post-restart, expected ${events.size}")
        }
        assert(n.nonEmpty)
      } finally q2.stop()
    }
  }
}
