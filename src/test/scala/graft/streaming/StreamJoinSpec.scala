package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Stream-stream interval join with watermarks on both sides — the
  * Structured Streaming capability that replaces ad-hoc cross-batch
  * correlation: views join to the clicks that happened within 10 minutes
  * after them, state bounded by the watermark.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(7200_000L + minute * 60_000L)

  test("views join clicks within the interval; state stays watermark-bounded") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]

    val v = views.toDF().toDF("user_id", "view_ts").withWatermark("view_ts", "5 minutes")
    val c = clicks.toDF().toDF("click_user", "click_ts").withWatermark("click_ts", "5 minutes")

    val joined = v.join(c,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("user_id"), col("view_ts"), col("click_ts"))

    val query = joined.writeStream.format("memory")
      .queryName("ssj_test").outputMode("append").start()
    try {
      views.addData((1L, ts(0)), (2L, ts(0)))
      clicks.addData((1L, ts(3)))          // within 10 min of user 1's view
      query.processAllAvailable()
      clicks.addData((2L, ts(20)))         // outside user 2's interval
      clicks.addData((1L, ts(8)))          // second click inside interval
      // advance both watermarks so results finalize
      views.addData((99L, ts(40)))
      clicks.addData((99L, ts(60)))
      query.processAllAvailable()

      val rows = spark.table("ssj_test")
        .as[(Long, Timestamp, Timestamp)].collect().toSet
      assert(rows.map(r => (r._1, r._3)) == Set((1L, ts(3)), (1L, ts(8))),
        rows.mkString(";"))
    } finally query.stop()
  }

  test("LEFT OUTER stream-stream join emits the unmatched view once its watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]

    val v = views.toDF().toDF("user_id", "view_ts").withWatermark("view_ts", "5 minutes")
    val c = clicks.toDF().toDF("click_user", "click_ts").withWatermark("click_ts", "5 minutes")

    val joined = v.join(c,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 10 MINUTES"),
      "leftOuter")
      .select(col("user_id"), col("view_ts"), col("click_ts"))

    val query = joined.writeStream.format("memory")
      .queryName("ssj_outer").outputMode("append").start()
    try {
      views.addData((1L, ts(0)), (2L, ts(0)))
      clicks.addData((1L, ts(3))) // user 1 converts; user 2 never clicks
      query.processAllAvailable()
      // user 2's NULL row cannot be emitted yet — a matching click could
      // still arrive until the watermark passes view_ts + 10 min
      val early = spark.table("ssj_outer")
        .where(col("user_id") === 2L).count()
      assert(early == 0, "outer row must wait for the watermark")
      // push both watermarks far past the join horizon
      views.addData((99L, ts(120)))
      clicks.addData((99L, ts(120)))
      query.processAllAvailable()
      views.addData((98L, ts(125)))
      clicks.addData((98L, ts(125)))
      query.processAllAvailable()
      val u2 = spark.table("ssj_outer")
        .where(col("user_id") === 2L)
        .select(col("click_ts").isNull).as[Boolean].collect().toSeq
      assert(u2 == Seq(true),
        s"expected exactly one NULL-click row for user 2, saw ${u2.size}")
    } finally query.stop()
  }
}
