package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming quantile sketch (batch q152's cross-batch twin): the
  * snapshot is batch-boundary-invariant (the bottom-k sample is an
  * order-free bounded monoid) and the final estimates equal batch
  * q152's output bit-for-bit — the stream maintains the identical
  * statistic the batch job computes.
  */
class StreamQuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private type Ev = (Long, String, Double)

  private lazy val events: Seq[Ev] =
    spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_id", "event_type", "value").as[Ev].collect().toSeq

  /** final snapshot per (grp, ql) = row with max n (counts only grow). */
  private def run(batches: Seq[Seq[Ev]], name: String)
    : Map[(String, String), (Long, Long, Long)] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val query = StreamQuantileSketch(stream.toDF()
        .toDF("event_id", "event_type", "value"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      spark.table(name).as[(String, String, Long, Long, Long)].collect()
        .groupBy(r => (r._1, r._2)).view
        .mapValues(rs => { val m = rs.maxBy(_._3); (m._3, m._4, m._5) })
        .toMap
    } finally query.stop()
  }

  test("split invariance; final estimates equal batch q152 bit-for-bit") {
    val one = run(Seq(events), "sq_one")
    val (a, rest) = events.splitAt(events.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    val three = run(Seq(a, b, c), "sq_three")
    assert(one == three, "sketch depends on batch boundaries — not a monoid")

    val batch = graft.queries.AnalyticsQueries.quantileSketch(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(one == batch,
      "stream estimates must equal the batch sketch exactly")
  }
}
