package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming decontamination: a training doc sharing an 8-gram with the
  * static eval set is flagged (once), clean docs are not, across batch
  * boundaries. */
class StreamDecontamSpec extends SparkSpec {
  import spark.implicits._

  test("eval-overlapping doc is flagged once; clean docs pass") {
    val evalText = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("text").limit(1).as[String].head()
    val evalDocs = Seq((9000L, evalText)).toDF("doc_id", "text")

    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val flagged = StreamDecontam.contaminated(
      stream.toDS().toDF("doc_id", "text"), evalDocs)
    val query = flagged.writeStream.format("memory").queryName("decontam")
      .outputMode("append").start()
    try {
      stream.addData((1L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      query.processAllAvailable()
      stream.addData((2L, evalText)) // verbatim benchmark text, later batch
      stream.addData((3L, "one two")) // too short for any 8-gram
      query.processAllAvailable()
      stream.addData((4L, evalText)) // second contaminated doc
      query.processAllAvailable()
      val rows = spark.table("decontam")
        .select("doc_id", "eval_doc").as[(Long, Long)].collect().toSet
      assert(rows == Set((2L, 9000L), (4L, 9000L)), s"saw $rows")
    } finally query.stop()
  }

  test("shingleHashes matches the batch Dedup.shingles hashing") {
    import org.apache.spark.sql.functions.{col, xxhash64}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").limit(20)
    val a = StreamDecontam.shingleHashes(docs, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = graft.llm.Dedup.shingles(docs, 8)
      .select(col("doc_id"), xxhash64(col("s")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
