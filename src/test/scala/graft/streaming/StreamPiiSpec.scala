package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming PII scrub: the same expression family as batch q78 applied
  * in flight — redacted text reaches the sink, raw PII never does, and
  * a document's streaming redaction equals its batch redaction exactly.
  */
class StreamPiiSpec extends SparkSpec {
  import spark.implicits._

  private val withPii =
    "please reach jane.doe+x@corp.example.org or 555-123-9876 from 10.1.2.3 today"
  private val cleanDoc = "nothing sensitive in this perfectly ordinary sentence"

  test("in-flight redaction: PII is replaced before the sink, counts are right") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDS().toDF("doc_id", "text")
    val q = StreamPii.scrubbed(docs)
      .writeStream.format("memory").queryName("stream_pii")
      .outputMode("append").start()
    try {
      stream.addData((1L, withPii), (2L, cleanDoc))
      q.processAllAvailable()
      val rows = spark.table("stream_pii")
        .select("doc_id", "text", "n_emails", "n_phones", "n_ips", "has_pii")
        .collect().map(r => r.getLong(0) -> r).toMap
      val flagged = rows(1L)
      assert(flagged.getString(1) ==
        "please reach <EMAIL> or <PHONE> from <IP> today")
      assert(flagged.getLong(2) == 1 && flagged.getLong(3) == 1 &&
        flagged.getLong(4) == 1 && flagged.getBoolean(5))
      val clean = rows(2L)
      assert(clean.getString(1) == cleanDoc && !clean.getBoolean(5))
    } finally q.stop()
  }

  test("streaming redaction equals the batch q78 expressions on the same text") {
    val batch = Seq((1L, withPii), (2L, cleanDoc)).toDF("doc_id", "text")
    val streamed = StreamPii.scrubbed(batch)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val direct = batch.select(col("doc_id"),
        graft.text.Pii.redact(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(streamed == direct)
  }

  test("card class: Luhn-valid runs are counted and redacted, invalid stay") {
    implicit val sqlCtx = spark.sqlContext
    val valid = "pay with 4111111111111111 thanks"       // Luhn-valid test PAN
    val invalid = "order 4111111111111112 confirmed"      // checksum fails
    val stream = MemoryStream[(Long, String)]
    val q = StreamPii.scrubbed(stream.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("stream_pii_cards")
      .outputMode("append").start()
    try {
      stream.addData((1L, valid), (2L, invalid))
      q.processAllAvailable()
      val rows = spark.table("stream_pii_cards")
        .select("doc_id", "text", "n_cards", "has_card", "has_pii")
        .collect().map(r => r.getLong(0) -> r).toMap
      assert(rows(1L).getString(1) == "pay with <CARD> thanks")
      assert(rows(1L).getLong(2) == 1 && rows(1L).getBoolean(3))
      assert(rows(2L).getString(1) == invalid,
        "a run that fails the checksum is an order id, not PII")
      assert(rows(2L).getLong(2) == 0 && !rows(2L).getBoolean(3))
      // the card flag is its own class: neither doc trips q78's
      // three-class has_pii
      assert(!rows(1L).getBoolean(4) && !rows(2L).getBoolean(4))
    } finally q.stop()
  }

  test("quarantine mode drops flagged documents from the stream") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamPii.clean(stream.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("stream_pii_clean")
      .outputMode("append").start()
    try {
      stream.addData((1L, withPii), (2L, cleanDoc))
      q.processAllAvailable()
      val kept = spark.table("stream_pii_clean").select("doc_id")
        .as[Long].collect().toSet
      assert(kept == Set(2L), s"expected only the clean doc, kept $kept")
    } finally q.stop()
  }
}
