package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key custom state on streams (SURVEY §2.10): the engine-level
  * primitive the reference approximates with Python driver globals +
  * pickle files. `KeyValueGroupedDataset.flatMapGroupsWithState` keeps
  * state partitioned BY KEY on the executors — state scales with
  * #keys × state size across the cluster, never through the driver.
  */
object Stateful {

  case class UserEvent(userId: Long, value: Double)
  case class UserRunning(userId: Long, n: Long, sum: Double, mean: Double)

  /** Running per-user count/sum/mean, emitted on every update. */
  def runningUserStats(events: Dataset[UserEvent]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[UserEvent], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          batch.foreach { e => n += 1; s += e.value }
          state.update((n, s))
          Iterator.single(UserRunning(userId, n, s, s / n))
      }
  }
}
