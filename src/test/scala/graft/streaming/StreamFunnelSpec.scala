package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** StreamFunnel: the stage-reach stream, aggregated per stage, equals
  * batch q70 exactly — under a full cross-batch shuffle of the event
  * log (the disorder the watermark buffer exists to repair), and each
  * user emits each stage at most once so the append stream is already
  * the distinct user set. */
class StreamFunnelSpec extends SparkSpec {
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

  private def run(batches: Seq[Seq[Ev]], name: String)
    : Seq[(Long, String)] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val query = StreamFunnel(stream.toDF()
        .toDF("user_id", "ts", "event_id", "event_type"), "45 days")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      stream.addData(Seq((-1L, new Timestamp(maxTsMs + 46 * Day), 1L, "flush")))
      query.processAllAvailable()
      stream.addData(Seq((-2L, new Timestamp(maxTsMs + 47 * Day), 2L, "flush")))
      query.processAllAvailable()
      spark.table(name).as[(Long, String, Long)].collect()
        .filter(_._1 >= 0).map(r => (r._1, r._2)).toSeq
    } finally query.stop()
  }

  test("cross-batch shuffled stage reaches equal batch q70's counts") {
    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle(real)
    val third = shuffled.size / 3
    val got = run(Seq(shuffled.take(third),
      shuffled.slice(third, 2 * third), shuffled.drop(2 * third)), "sfun")
    // at most one reach per (user, stage)
    assert(got.distinct.size == got.size, "duplicate stage-reach emitted")
    val gotCounts = got.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val batch = graft.queries.WindowQueries.funnel(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(gotCounts == batch,
      s"stream funnel $gotCounts != batch q70 $batch")
    // funnel monotonicity: stage populations can only shrink downstream
    assert(batch("1_view") >= batch("2_click_after_view") &&
      batch("2_click_after_view") >= batch("3_purchase_after_click"))
  }
}
