package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.streaming.StreamDedup.Doc

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  test("first occurrence passes, duplicates drop — within and across batches") {
    withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Doc]
    val query = StreamDedup.firstSeen(stream.toDF())
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      stream.addData(Doc(3, "alpha"), Doc(1, "alpha"), Doc(2, "beta"))
      query.processAllAvailable()
      stream.addData(Doc(9, "alpha"), Doc(5, "gamma"), Doc(7, "beta"))
      query.processAllAvailable()

      val kept = spark.table("dedup_test")
        .as[StreamDedup.Deduped].collect().map(_.docId).sorted.toSeq
      // "alpha" kept once (smallest id in its first batch), "beta" once,
      // "gamma" from batch 2; batch-2 re-occurrences dropped
      assert(kept == Seq(1L, 2L, 5L))
    } finally query.stop()
    }
  }

  test("dropDuplicatesWithinWatermark bounds state for the TTL'd variant") {
    // the builtin bounded-state alternative StreamDedup's scaladoc points
    // to: duplicates within the watermark horizon drop, state expires
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    val stream = MemoryStream[(Long, String, Timestamp)]
    val deduped = stream.toDF().toDF("docId", "text", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("text")
    val query = deduped.writeStream.format("memory")
      .queryName("ttl_dedup_test").outputMode("append").start()
    try {
      def ts(m: Int) = new Timestamp(3600_000L + m * 60_000L)
      stream.addData((1L, "alpha", ts(0)), (2L, "alpha", ts(1)), (3L, "beta", ts(2)))
      query.processAllAvailable()
      stream.addData((4L, "alpha", ts(3)))   // duplicate within horizon
      query.processAllAvailable()
      val kept = spark.table("ttl_dedup_test").select("docId")
        .as[Long].collect().sorted.toSeq
      assert(kept == Seq(1L, 3L), kept)
    } finally query.stop()
  }
}
