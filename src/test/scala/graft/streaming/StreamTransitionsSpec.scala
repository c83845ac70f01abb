package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming transitions (batch q124's cross-batch twin): under
  * per-user-ordered delivery the emitted transition multiset is
  * invariant to batch boundaries and equals batch q124's counts
  * exactly; within one batch, arrival order is repaired by the
  * (ts, event_id) sort.
  */
class StreamTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private type Ev = (Long, Timestamp, Long, String)

  /** events in per-user event-time order (the keyed-log contract). */
  private lazy val ordered: Seq[Ev] =
    spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("user_id", s"$tsMicros AS tsu", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._2, t._3))
      .map(t => (t._1, new Timestamp(t._2 / 1000L), t._3, t._4))

  private def run(batches: Seq[Seq[Ev]], name: String)
    : Map[(Long, String, String), Long] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val query = StreamTransitions(stream.toDF()
        .toDF("user_id", "ts", "event_id", "event_type"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      spark.table(name).as[(Long, String, String)].collect()
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    } finally query.stop()
  }

  test("split invariance under ordered delivery; count parity with batch q124") {
    val one = run(Seq(ordered), "st_one")
    val (a, rest) = ordered.splitAt(ordered.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    val three = run(Seq(a, b, c), "st_three")
    assert(one == three,
      "transition multiset depends on batch boundaries under ordered delivery")

    val batch = graft.queries.AnalyticsQueries.eventTransitions(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val streamed = one.toSeq
      .groupBy { case ((_, p, n), _) => (p, n) }.view
      .mapValues(_.map(_._2).sum).toMap
    assert(streamed == batch,
      s"streamed matrix differs from batch q124:\n$streamed\n$batch")
  }

  test("in-batch arrival disorder is repaired by the (ts, event_id) sort") {
    def ev(id: Long, minute: Long, typ: String): Ev =
      (7L, new Timestamp(1700000000000L + minute * 60000L), id, typ)
    // arrivals shuffled within ONE batch: view(t0) click(t1) buy(t2)
    val batch = Seq(ev(3, 2, "buy"), ev(1, 0, "view"), ev(2, 1, "click"))
    val got = run(Seq(batch), "st_sort")
    assert(got == Map((7L, "view", "click") -> 1L, (7L, "click", "buy") -> 1L),
      s"expected the time-ordered chain, got $got")
  }
}
