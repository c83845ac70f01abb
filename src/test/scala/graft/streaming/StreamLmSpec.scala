package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming bigram-LM counts (batch q172's cross-batch twin): the
  * final state is invariant to batch boundaries and equals the
  * batch-derived bigram count table over the same documents.
  */
class StreamLmSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: Seq[(Long, String)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq

  /** final count per pair = the max emission (counts only grow). */
  private def run(batches: Seq[Seq[(Long, String)]], name: String)
    : Map[(String, String), Long] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val query = StreamLm(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      spark.table(name).as[(String, String, Long)].collect()
        .groupBy(r => (r._1, r._2)).view
        .mapValues(_.map(_._3).max).toMap
    } finally query.stop()
  }

  test("boundary invariance and parity with the batch bigram table") {
    val one = run(Seq(docs), "lm_one")
    val (a, rest) = docs.splitAt(docs.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    val three = run(Seq(a, b, c), "lm_three")
    assert(one == three, "counts depend on batch boundaries")

    // batch truth: q172's bigram derivation over the same rows
    val batch = docs.toDF("doc_id", "text").as[(Long, String)]
      .flatMap { case (_, text) =>
        val w = text.trim.split("\\s+")
        if (w.length >= 2) (0 until w.length - 1).iterator
          .map(i => (w(i), w(i + 1)))
        else Iterator.empty
      }.toDF("t1", "t2")
      .groupBy("t1", "t2").count()
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(one == batch, "stream state must equal the batch count table")
    assert(batch.nonEmpty)
  }

  test("checkpointed restart resumes the count state (RocksDB provider)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("lm_restart").toString
      val stream = MemoryStream[(Long, String)]
      val out = s"$dir/out"
      def start() =
        StreamLm(stream.toDF().toDF("doc_id", "text")).writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", s"$dir/ckpt")
          .outputMode("append").start()
      val (a, b) = docs.splitAt(docs.size / 2)
      val q1 = start()
      try { stream.addData(a); q1.processAllAvailable() } finally q1.stop()
      // restart from the checkpoint; the second half's emissions must
      // build on the restored counts — the max per pair across all
      // emissions then equals the whole-corpus table iff state survived
      val q2 = start()
      try { stream.addData(b); q2.processAllAvailable() } finally q2.stop()
      val merged = spark.read.parquet(out)
        .selectExpr("t1", "t2", "cnt").as[(String, String, Long)].collect()
        .groupBy(r => (r._1, r._2)).view
        .mapValues(_.map(_._3).max).toMap
      val whole = run(Seq(docs), "lm_whole")
      assert(merged == whole, "restart lost or double-counted LM state")
    }
  }
}
