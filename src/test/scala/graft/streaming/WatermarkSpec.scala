package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Event-time semantics the engine adds over the reference (which has no
  * event time at all — SURVEY §2.10): watermark + tumbling windowed
  * aggregation, with late data beyond the watermark dropped.
  */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(3600_000L + minute * 60_000L)

  test("watermarked tumbling count finalizes windows and drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Double)]
    val agg = stream.toDF().toDF("ts", "value")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w_start"), col("cnt"))

    val query = agg.writeStream.format("memory")
      .queryName("wm_test").outputMode("append").start()
    try {
      // window [60,70): three events
      stream.addData((ts(1), 1.0), (ts(4), 1.0), (ts(9), 1.0))
      query.processAllAvailable()
      // advance event time far enough to close [60,70) (watermark = max-5m)
      stream.addData((ts(21), 1.0))
      query.processAllAvailable()
      // this event is 20 minutes late — behind the watermark — dropped
      stream.addData((ts(2), 99.0))
      query.processAllAvailable()
      // close everything else out
      stream.addData((ts(41), 1.0))
      query.processAllAvailable()

      val rows = spark.table("wm_test")
        .as[(Timestamp, Long)].collect().toMap
      assert(rows(ts(0)) == 3L, s"got $rows")   // late event NOT counted
    } finally query.stop()
  }
}
