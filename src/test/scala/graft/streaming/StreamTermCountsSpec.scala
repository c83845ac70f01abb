package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming (source, term) counts — the live feed under the q184/q185
  * scorers: the monoid state is batch-boundary-invariant, the final
  * snapshot equals the batch termCounts aggregation row for row, and
  * the SAME scorer (keynessOver) over the snapshot reproduces batch
  * q184 exactly — the live keyness board and the nightly audit can
  * disagree only on recency, never on arithmetic.
  */
class StreamTermCountsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: Seq[(String, String)] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").as[(String, String)].collect().toSeq

  private lazy val batchTf: Map[(String, String), Long] =
    graft.queries.TextStatsQueries.termCounts(spark, sfDir)
      .as[(String, String, Long)].collect()
      .map { case (s, t, a) => (s, t) -> a }.toMap

  /** latest snapshot per key = its max a (counts only grow). */
  private def run(batches: Seq[Seq[(String, String)]], name: String)
    : Map[(String, String), Long] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val query = StreamTermCounts(stream.toDF().toDF("source", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      spark.table(name).as[(String, String, Long)].collect()
        .groupBy(r => (r._1, r._2)).view
        .mapValues(_.map(_._3).max).toMap
    } finally query.stop()
  }

  test("split invariance; final snapshot equals the batch termCounts") {
    val one = run(Seq(docs), "tc_one")
    val (a, rest) = docs.splitAt(docs.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    val three = run(Seq(a, b, c), "tc_three")
    assert(one == three, "term-count state depends on batch boundaries")
    assert(one == batchTf, "live snapshot differs from batch termCounts")
  }

  test("keynessOver the live snapshot reproduces batch q184 row for row") {
    val snap = run(Seq(docs), "tc_keyness")
      .toSeq.map { case ((s, t), a) => (s, t, a) }
      .toDF("source", "t", "a")
    val live = graft.queries.TextStatsQueries.keynessOver(snap)
      .collect().map(_.toSeq).toSeq
    val batch = graft.queries.TextStatsQueries.keyness(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(live == batch, "live keyness differs from batch q184")
  }
}
