package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming sequence packing must continue each shard's token stream
  * across micro-batches and agree with batch q79 on an identically-
  * ordered corpus.
  */
class StreamPackSpec extends SparkSpec {
  import spark.implicits._
  import StreamPack.{Doc, Packed}

  test("packing continues across micro-batches exactly where it left off") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Doc]
    val q = StreamPack.packed(stream.toDS(), budget = 100L)
      .writeStream.format("memory").queryName("stream_pack")
      .outputMode("append").start()
    try {
      // batch 1: src-a fills 70 of pack 0
      stream.addData(Doc(1, "a", 40), Doc(2, "a", 30), Doc(10, "b", 90))
      q.processAllAvailable()
      // batch 2: doc 3 starts at offset 70 (same pack); doc 4 starts at
      // 90 — still inside pack 0 (concat-then-chunk: a doc belongs to
      // the pack its START offset falls in); src-b's doc 11 likewise
      stream.addData(Doc(3, "a", 20), Doc(4, "a", 50), Doc(11, "b", 20),
        Doc(12, "b", 30))
      q.processAllAvailable()
      val rows = spark.table("stream_pack").as[Packed].collect()
        .map(p => p.docId -> p).toMap
      assert(rows(1L) == Packed(1, "a", 40, 0, 0))
      assert(rows(2L) == Packed(2, "a", 30, 0, 40))
      assert(rows(3L) == Packed(3, "a", 20, 0, 70))
      assert(rows(4L) == Packed(4, "a", 50, 0, 90))   // starts in pack 0
      assert(rows(10L) == Packed(10, "b", 90, 0, 0))
      assert(rows(11L) == Packed(11, "b", 20, 0, 90))  // starts inside pack 0
      assert(rows(12L) == Packed(12, "b", 30, 1, 110)) // first to START in pack 1
    } finally q.stop()
  } }

  test("stream packing equals batch q79 on the documents corpus") { withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
      .map { case (id, src, n) => Doc(id, src, n) }
    val stream = MemoryStream[Doc]
    val q = StreamPack.packed(stream.toDS(), budget = 256L)
      .writeStream.format("memory").queryName("stream_pack_corpus")
      .outputMode("append").start()
    try {
      // feed in three micro-batches split mid-corpus
      docs.grouped(docs.length / 3 + 1).foreach { b =>
        stream.addData(b.toSeq); q.processAllAvailable()
      }
      val streamed = spark.table("stream_pack_corpus").as[Packed].collect()
        .groupBy(p => (p.source, p.packId))
        .view.mapValues(ps => (ps.length.toLong, ps.map(_.nTok).sum)).toMap
      val batch = graft.queries.CurationQueries.sequencePack(spark, sfDir)
        .collect().map(r => ((r.getString(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3)))).toMap
      assert(streamed == batch,
        "stream pack assignments must equal batch q79's")
    } finally q.stop()
  } }
}
