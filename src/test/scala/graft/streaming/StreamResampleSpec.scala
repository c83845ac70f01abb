package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming OHLC (batch q108's cross-batch twin): the defining case is
  * an hour's true open arriving BATCHES AFTER later events of the same
  * hour — only the merged (ts, event_id) arg-min can still produce it.
  * Also asserts batch-boundary invariance (the same rows split
  * differently give identical final snapshots) and exact integer sums.
  */
class StreamResampleSpec extends SparkSpec {
  import spark.implicits._

  // rows: (event_type, ts, event_id, value)
  private type Ev = (String, Timestamp, Long, Double)
  private def ev(t: String, sec: Long, id: Long, v: Double): Ev =
    (t, new Timestamp(sec * 1000L), id, v)

  /** Run batches through the stream, return the LAST snapshot per bucket. */
  private def run(name: String, batches: Seq[Seq[Ev]])
    : Map[(String, Long), (Long, Double, Double, Double, Double, Long)] =
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Ev]
      val query = StreamResample(
        stream.toDF().toDF("event_type", "ts", "event_id", "value"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        batches.foreach { b => stream.addData(b); query.processAllAvailable() }
        val rows = spark.table(name)
          .as[(String, Long, Long, Double, Double, Double, Double, Long)]
          .collect().toSeq
        val maxN = rows.groupBy(r => (r._1, r._2)).view
          .mapValues(_.map(_._3).max).toMap
        rows.filter(r => r._3 == maxN((r._1, r._2)))
          .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7, r._8)))
          .toMap
      } finally query.stop()
    }

  test("an hour's true open arriving two batches late still wins") {
    val hour = 1700000000L / 3600 * 3600
    val snap = run("sr_late", Seq(
      Seq(ev("a", hour + 1800, 10L, 50.0), ev("a", hour + 3599, 11L, 70.0)),
      Seq(ev("a", hour + 900, 12L, 30.0)),
      Seq(ev("a", hour + 1, 13L, 10.0)))) // earliest ts, latest arrival
    val (n, open, high, low, close, cents) = snap(("a", hour))
    assert(n == 4 && open == 10.0 && close == 70.0)
    assert(high == 70.0 && low == 10.0)
    assert(cents == 16000L) // (50+70+30+10)*100 exact
  }

  test("final snapshots are invariant to how rows split across batches") {
    val hour = 1700003600L / 3600 * 3600
    val rows = (0 until 60).map(i =>
      ev(if (i % 2 == 0) "x" else "y", hour + (i * 53 % 3600), i.toLong,
        (i * 37 % 100) + 0.25))
    val oneBatch = run("sr_one", Seq(rows))
    val threeBatches = run("sr_three",
      Seq(rows.slice(40, 60), rows.slice(0, 20), rows.slice(20, 40)))
    assert(oneBatch == threeBatches)
    assert(oneBatch.keySet == Set(("x", hour), ("y", hour)))
  }

  test("timestamp ties resolve by event_id on both ends") {
    val hour = 1700007200L / 3600 * 3600
    val snap = run("sr_ties", Seq(
      Seq(ev("t", hour + 5, 2L, 20.0), ev("t", hour + 5, 3L, 30.0)),
      Seq(ev("t", hour + 5, 1L, 11.0), ev("t", hour + 5, 4L, 40.0))))
    val (_, open, _, _, close, _) = snap(("t", hour))
    assert(open == 11.0 && close == 40.0)
  }
}
