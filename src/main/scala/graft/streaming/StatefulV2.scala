package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** The same running-per-user statistics as graft.streaming.Stateful, on
  * Spark 4's arbitrary-state v2 API (`transformWithState` +
  * `StatefulProcessor`): typed state handles instead of a single opaque
  * GroupState value — the engine's path for multi-variable or TTL'd
  * state once flatMapGroupsWithState's single-value model gets tight.
  */
object StatefulV2 {

  import Stateful.{UserEvent, UserRunning}

  class RunningStatsProcessor
    extends StatefulProcessor[Long, UserEvent, UserRunning] {
    @transient private var stats: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      stats = getHandle.getValueState[(Long, Double)]("stats",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)

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
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
