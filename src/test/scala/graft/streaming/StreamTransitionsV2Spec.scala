package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Watermark-buffered transitions: exact parity with batch q124 under
  * ADVERSARIAL cross-batch shuffling — the disorder class the last-
  * event variant documents as out of contract — as long as the
  * disorder fits the watermark delay. Sentinel users (negative ids)
  * push the global watermark past the real data to force the final
  * timer flush; their own single events mint no transitions.
  */
class StreamTransitionsV2Spec extends SparkSpec {
  import spark.implicits._

  private type Ev = (Long, Timestamp, Long, String)

  private lazy val real: Seq[Ev] =
    spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("user_id", s"$tsMicros AS tsu", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._2, t._3))
      .map(t => (t._1, new Timestamp(t._2 / 1000L), t._3, t._4))

  private lazy val maxTsMs: Long = real.map(_._2.getTime).max
  private val Day = 86400000L

  /** Run the buffered variant (45-day watermark) over the batches, then
    * two sentinel batches (relative to `lastMs`, the workload's max
    * event time) to advance the watermark past all real events and fire
    * the flush timers. */
  private def run(batches: Seq[Seq[Ev]], name: String, lastMs: Long)
    : Map[(Long, String, String), Long] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val query = StreamTransitionsV2(stream.toDF()
        .toDF("user_id", "ts", "event_id", "event_type"), "45 days")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      // sentinel 1 lifts the watermark past every real event; sentinel 2
      // triggers the micro-batch in which the expired timers fire
      stream.addData(Seq((-1L, new Timestamp(lastMs + 46 * Day), 1L, "flush")))
      query.processAllAvailable()
      stream.addData(Seq((-2L, new Timestamp(lastMs + 47 * Day), 2L, "flush")))
      query.processAllAvailable()
      spark.table(name).as[(Long, String, String)].collect()
        .filter(_._1 >= 0)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    } finally query.stop()
  }

  private lazy val batchMatrix: Map[(String, String), Long] =
    graft.queries.AnalyticsQueries.eventTransitions(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  private def toMatrix(per: Map[(Long, String, String), Long]) =
    per.toSeq.groupBy { case ((_, p, n), _) => (p, n) }.view
      .mapValues(_.map(_._2).sum).toMap

  test("adversarial cross-batch shuffle still equals batch q124 exactly") {
    // deterministic full shuffle of the event log, split across batches:
    // per-user order is violated both within and ACROSS batches
    val rnd = new scala.util.Random(42)
    val shuffled = rnd.shuffle(real)
    val third = shuffled.size / 3
    val batches = Seq(shuffled.take(third),
      shuffled.slice(third, 2 * third), shuffled.drop(2 * third))
    val got = run(batches, "stv2_shuffled", maxTsMs)
    assert(toMatrix(got) == batchMatrix,
      "buffered variant diverges from batch q124 under cross-batch shuffle")
  }

  test("the exact case that breaks the last-event variant is repaired") {
    def ev(id: Long, minute: Long, typ: String): Ev =
      (7L, new Timestamp(1700000000000L + minute * 60000L), id, typ)
    // click(t1) arrives a BATCH AFTER buy(t2): the last-event variant
    // would emit view→buy then buy→click; the buffered one must not
    val got = run(Seq(Seq(ev(1, 0, "view"), ev(3, 2, "buy")),
      Seq(ev(2, 1, "click"))), "stv2_late", 1700000000000L + 2 * 60000L)
    assert(got == Map((7L, "view", "click") -> 1L, (7L, "click", "buy") -> 1L),
      s"expected the time-ordered chain, got $got")
  }
}
