package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming event-transition counts: batch q124's cross-batch twin —
  * the live Markov matrix behind real-time anomaly scoring. Per user
  * the state is the LAST event seen ((ts, event_id, type) — one fixed
  * row); each arrival emits the (prev → next) transition it completes
  * and becomes the new last event. Within a batch, a user's rows are
  * folded in (ts, event_id) order, so batch boundaries don't matter as
  * long as delivery is ORDERED PER USER across batches — exactly the
  * guarantee a user-keyed log partition (the standard deployment for
  * this stream) provides. A cross-batch out-of-order arrival would
  * mint a transition the batch job wouldn't; that is the documented
  * contract, and the q124 backfill reconciles drift, the same
  * stream-now / batch-later split as every other twin.
  *
  * Emits RAW transitions; the matrix is a downstream counting agg
  * (kept out of this operator so its state semantics stay testable).
  *
  * Scale posture: state is one fixed-size row per user; per-arrival
  * work is an O(b log b) in-batch sort of that user's b arrivals plus
  * O(1) per row; users shard the store.
  */
object StreamTransitions {

  case class EvMsg(userId: Long, tsu: Long, eventId: Long, eventType: String)
  case class LastEv(tsu: Long, eventId: Long, eventType: String)
  case class Transition(userId: Long, prevType: String, nextType: String)

  class UserProcessor extends StatefulProcessor[Long, EvMsg, Transition] {
    @transient private var state: ValueState[LastEv] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[LastEv]("last",
        Encoders.product[LastEv], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EvMsg],
                                 timerValues: TimerValues): Iterator[Transition] = {
      val sorted = rows.toArray.sortBy(m => (m.tsu, m.eventId))
      var last = Option(state.get())
      val out = Vector.newBuilder[Transition]
      sorted.foreach { m =>
        last.foreach(l => out += Transition(key, l.eventType, m.eventType))
        last = Some(LastEv(m.tsu, m.eventId, m.eventType))
      }
      last.foreach(state.update)
      out.result().iterator
    }
  }

  /** events(user_id, ts, event_id, event_type) as a stream → completed
    * transitions, exact under per-user-ordered delivery. */
  def apply(events: DataFrame): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").as("userId"), unix_micros(col("ts")).as("tsu"),
        col("event_id").as("eventId"), col("event_type").as("eventType"))
      .as[EvMsg]
      .groupByKey(_.userId)
      .transformWithState(new UserProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
