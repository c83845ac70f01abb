package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming quality gate: the same expression family as batch q34,
  * applied in flight — low-quality documents never reach the sink, and
  * a document's streaming score equals its batch score exactly.
  */
class StreamQualitySpec extends SparkSpec {
  import spark.implicits._

  private val good =
    "a thoughtful essay with varied vocabulary discussing several distinct ideas clearly"
  private val junk = "spam spam spam spam spam spam spam spam spam spam"

  test("low-quality documents are filtered out of the stream") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDS().toDF("doc_id", "text")
    val q = StreamQuality.filtered(docs, minScore = 0.5)
      .writeStream.format("memory").queryName("stream_quality")
      .outputMode("append").start()
    try {
      stream.addData((1L, good), (2L, junk))
      q.processAllAvailable()
      val kept = spark.table("stream_quality").select("doc_id")
        .as[Long].collect().toSet
      assert(kept == Set(1L), s"expected only the good doc, kept $kept")
    } finally q.stop()
  }

  test("streaming score equals the batch q34 score for the same text") {
    val batch = Seq((1L, good), (2L, junk)).toDF("doc_id", "text")
    val streamScored = StreamQuality.scored(batch)
      .select(col("doc_id"), col("quality_score")).as[(Long, Double)].collect().toMap
    // batch q34 path over the same rows (bypassing the table loader)
    val w = graft.text.Quality.tokens(col("text"))
    val q34 = batch.select(col("doc_id"), graft.text.Quality.score(w).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(streamScored == q34)
  }
}
