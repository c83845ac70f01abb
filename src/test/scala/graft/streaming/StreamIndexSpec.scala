package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming inverted-index maintenance (batch q151's cross-batch
  * twin): the snapshot is batch-boundary-invariant (counts/extents are
  * monoids; the bottom-k head's bounded merge is order-free) and its
  * final state equals batch q151's metadata column-for-column minus
  * gap_max, which bounded state deliberately does not carry.
  */
class StreamIndexSpec extends SparkSpec {
  import spark.implicits._

  private type Doc = (Long, String)

  private lazy val docs: Seq[Doc] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").as[Doc].collect().toSeq

  /** final snapshot per term = row with max df (counts only grow). */
  private def run(batches: Seq[Seq[Doc]], name: String)
    : Map[String, (Long, Long, Long, Long, Long, String)] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Doc]
    val query = StreamIndex(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      spark.table(name)
        .as[(String, Long, Long, Long, Long, Long, String)].collect()
        .groupBy(_._1).view
        .mapValues(rs => { val m = rs.maxBy(_._2)
          (m._2, m._3, m._4, m._5, m._6, m._7) })
        .toMap
    } finally query.stop()
  }

  test("split invariance; final snapshot equals batch q151 minus gap_max") {
    val one = run(Seq(docs), "si_one")
    val (a, rest) = docs.splitAt(docs.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    val three = run(Seq(a, b, c), "si_three")
    assert(one == three, "index depends on batch boundaries — not a monoid")

    val batch = graft.queries.TextStatsQueries.invertedIndex(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(6))))
      .toMap
    assert(one.keySet == batch.keySet, "term dictionaries differ")
    one.foreach { case (t, (df, tf, lo, hi, kUsed, head)) =>
      val (bdf, btf, blo, bhi, bhead) = batch(t)
      assert((df, tf, lo, hi) == ((bdf, btf, blo, bhi)), s"$t stats")
      assert(head == bhead, s"$t head: stream $head vs batch $bhead")
      assert(kUsed == math.min(df, StreamIndex.HeadK.toLong), s"$t k_used")
    }
  }
}
