package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** The same running-per-user statistics as graft.streaming.Stateful, on
  * Spark 4's arbitrary-state v2 API (`transformWithState` +
  * `StatefulProcessor`): typed state handles instead of a single opaque
  * GroupState value — the engine's path for multi-variable or TTL'd
  * state once flatMapGroupsWithState's single-value model gets tight.
  *
  * Two boundedness policies a long-running 100 TB stream needs on top of
  * the plain processor:
  *   - [[RunningStatsProcessor]] with a TTL: per-key state the store
  *     evicts `ttl` after the last write — idle keys cost nothing forever;
  *   - [[SessionFlushProcessor]]: processing-time timers that flush and
  *     clear a key's session after a quiet gap — the state-v2 face of a
  *     session window with explicit lifecycle control.
  */
object StatefulV2 {

  import Stateful.{UserEvent, UserRunning}

  /** Session summary emitted when a key's quiet-gap timer fires. */
  case class SessionSummary(userId: Long, n: Long, sum: Double)

  /** `ttl = None` keeps state forever (the reference's behavior);
    * `Some(d)` lets the state store expire a key's value `d` after its
    * last update, so abandoned keys are evicted instead of accumulating —
    * the difference between a demo and a month-long stream. */
  class RunningStatsProcessor(ttl: Option[Duration] = None)
    extends StatefulProcessor[Long, UserEvent, UserRunning] {
    @transient private var stats: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getValueState[(Long, Double)]("stats",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timerValues: TimerValues): Iterator[UserRunning] = {
      val (n0, s0) = Option(stats.get()).getOrElse((0L, 0.0))
      var n = n0; var s = s0
      rows.foreach { e => n += 1; s += e.value }
      stats.update((n, s))
      Iterator.single(UserRunning(key, n, s, s / n))
    }
  }

  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new RunningStatsProcessor(),
        TimeMode.None(), OutputMode.Append())
  }

  /** TTL'd variant: per-key state expires `ttl` after its last write, so
    * a key quiet longer than the TTL restarts its running stats from
    * zero — bounded state for unbounded key spaces. */
  def runningUserStatsTtl(events: Dataset[UserEvent],
                          ttl: Duration): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new RunningStatsProcessor(Some(ttl)),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Timer-driven session flush: accumulate per-key (n, sum); every input
    * re-arms a processing-time timer `gap` ahead; when a key stays quiet
    * past the gap the timer fires, the session summary is emitted ONCE and
    * the key's state (and timer) is cleared. Inputs themselves emit
    * nothing — output is purely timer-driven, the session-window pattern
    * with explicit state lifecycle. */
  class SessionFlushProcessor(gapMs: Long)
    extends StatefulProcessor[Long, UserEvent, SessionSummary] {
    @transient private var session: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[(Long, Double)]("session",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timerValues: TimerValues): Iterator[SessionSummary] = {
      val (n0, s0) = Option(session.get()).getOrElse((0L, 0.0))
      var n = n0; var s = s0
      rows.foreach { e => n += 1; s += e.value }
      session.update((n, s))
      // re-arm: drop any pending timer, schedule one quiet-gap ahead
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs() + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionSummary] = {
      val out = Option(session.get()).map { case (n, s) => SessionSummary(key, n, s) }
      session.clear()
      out.iterator
    }
  }

  def sessionFlush(events: Dataset[UserEvent], gapMs: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new SessionFlushProcessor(gapMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
