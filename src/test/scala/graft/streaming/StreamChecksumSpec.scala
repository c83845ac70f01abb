package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming checksum (batch q110's cross-batch twin): the snapshot is
  * batch-boundary-invariant (both digests are commutative monoids, the
  * additive one folded mod 2⁶¹−1 per arrival), reproduces batch q110's
  * documents digest bit-for-bit, and detects a single-character
  * mutation — the property a checksum exists for.
  */
class StreamChecksumSpec extends SparkSpec {
  import spark.implicits._

  private type Doc = (Long, String, String, String, Long)

  private lazy val docs: Seq[Doc] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text", "lang", "source", "n_chars")
      .as[Doc].collect().toSeq

  private def run(batches: Seq[Seq[Doc]], name: String): (Long, Long, Long) =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Doc]
      val query = StreamChecksum.documents(stream.toDF()
          .toDF("doc_id", "text", "lang", "source", "n_chars"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => stream.addData(b); query.processAllAvailable() }
        spark.table(name).as[(String, Long, Long, Long)].collect()
          .maxBy(_._2) match { case (_, n, s, x) => (n, s, x) }
      } finally query.stop()
    }

  test("split invariance, parity with batch q110, and mutation detection") {
    val one = run(Seq(docs), "sck_one")
    val (a, rest) = docs.splitAt(docs.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    val three = run(Seq(a, b, c), "sck_three")
    assert(one == three, "digest depends on batch boundaries — not a monoid")

    val batch = graft.queries.OpsQueries.tableChecksum(spark, sfDir).collect()
      .find(_.getString(0) == "documents").get
    assert(one == ((batch.getLong(1), batch.getLong(2), batch.getLong(3))),
      "stream digest must equal batch q110's documents row")

    val mutated = docs.updated(7,
      docs(7).copy(_2 = docs(7)._2.updated(0,
        if (docs(7)._2.head == 'x') 'y' else 'x')))
    val bad = run(Seq(mutated), "sck_bad")
    assert(bad._1 == one._1 && (bad._2 != one._2 || bad._3 != one._3),
      "a one-character mutation must change a digest at equal row count")
  }
}
