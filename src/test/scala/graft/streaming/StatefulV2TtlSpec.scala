package graft.streaming

import java.time.Duration

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.streaming.Stateful.UserEvent

/** State lifecycle on the v2 API (VERDICT r1 item 6): TTL'd value state
  * that the store evicts after a quiet period, and processing-time timers
  * that flush a session once its gap elapses.
  *
  * TimeMode.ProcessingTime queries run microbatches on every trigger tick
  * (that's how timers/TTL advance with no input), so these specs use an
  * explicit 200 ms trigger and POLL the sink with a deadline —
  * `processAllAvailable` never settles under a 0 ms busy-trigger.
  */
class StatefulV2TtlSpec extends SparkSpec {
  import spark.implicits._

  private def startQuery[T](ds: Dataset[T], name: String) =
    ds.writeStream.format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime("200 milliseconds"))
      .outputMode("append").start()

  /** Poll `cond` over the sink table every 250 ms for up to 60 s. */
  private def awaitSink(name: String)(cond: Long => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + 60000
    var n = spark.table(name).count()
    while (!cond(n) && System.currentTimeMillis() < deadline) {
      Thread.sleep(250)
      n = spark.table(name).count()
    }
    assert(cond(n), s"sink $name never satisfied the condition (rows=$n)")
  }

  test("TTL'd state is evicted after the TTL: quiet key restarts from zero") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[UserEvent]
      val query = startQuery(
        StatefulV2.runningUserStatsTtl(stream.toDS(), Duration.ofMillis(500)),
        "tws_ttl")
      try {
        stream.addData(UserEvent(1, 2.0), UserEvent(1, 4.0))
        awaitSink("tws_ttl")(_ >= 1)
        Thread.sleep(2000) // > TTL: the stats value for key 1 expires
        stream.addData(UserEvent(1, 10.0))
        awaitSink("tws_ttl")(_ >= 2)
        val rows = spark.table("tws_ttl").as[Stateful.UserRunning].collect()
        assert(rows.exists(r => r.userId == 1 && r.n == 2 && r.sum == 6.0))
        // post-TTL the count restarts at 1 — without eviction it would be 3
        assert(rows.exists(r => r.userId == 1 && r.n == 1 && r.sum == 10.0),
          s"expected a restarted count after TTL eviction, saw ${rows.mkString(", ")}")
      } finally query.stop()
    }
  }

  test("processing-time timer flushes and clears a quiet session exactly once") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[UserEvent]
      val query = startQuery(
        StatefulV2.sessionFlush(stream.toDS(), gapMs = 500), "tws_timer")
      try {
        stream.addData(UserEvent(1, 2.0), UserEvent(1, 3.0))
        // the open session emits nothing; the flush arrives once the
        // 500 ms quiet gap elapses and the next trigger fires the timer
        awaitSink("tws_timer")(_ >= 1)
        val afterFlush = spark.table("tws_timer")
          .as[StatefulV2.SessionSummary].collect()
        assert(afterFlush.toSeq == Seq(StatefulV2.SessionSummary(1, 2, 5.0)),
          s"expected exactly key 1's flushed session, saw ${afterFlush.mkString(", ")}")
        // state was cleared: new data opens a FRESH session that flushes
        // independently, and key 1 never re-flushes
        stream.addData(UserEvent(2, 7.0))
        awaitSink("tws_timer")(_ >= 2)
        val all = spark.table("tws_timer").as[StatefulV2.SessionSummary].collect()
        assert(all.count(_.userId == 1) == 1, "session must flush exactly once")
        assert(all.exists(s => s.userId == 2 && s.n == 1 && s.sum == 7.0))
      } finally query.stop()
    }
  }
}
