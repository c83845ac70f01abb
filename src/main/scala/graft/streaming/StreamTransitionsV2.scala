package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Watermark-buffered streaming transitions — [[StreamTransitions]]
  * WITHOUT its delivery contract (r6 verdict item 6): the last-event
  * variant is exact only under per-user-ordered delivery, because a
  * cross-batch out-of-order arrival mints a transition the batch job
  * wouldn't. This variant removes the contract the standard way: per
  * user, arrivals BUFFER in state until the event-time watermark passes
  * them, then flush in (ts, event_id) order, chaining from the last
  * FLUSHED event — so any disorder within the watermark delay is
  * repaired, cross-batch included, and the emitted multiset equals
  * batch q124's under arbitrary shuffling. (Events later than the
  * watermark remain the irreducible residue — that is the watermark's
  * definition, not a contract of this operator.)
  *
  * Mechanics: one ListState buffer + one LastEv per user; each input
  * batch appends, opportunistically flushes everything ripe
  * (event-time ≤ current watermark), and re-arms a single event-time
  * timer at the newest still-buffered event — so a user whose events
  * stop arriving still flushes when the GLOBAL watermark passes them
  * (timers fire without input for the key).
  *
  * Scale posture: state per user is the last event plus only the
  * events inside the watermark horizon (delay-bounded, the same bound
  * every watermarked stateful operator carries); flush work is
  * O(b log b) in the buffered count; users shard the RocksDB store.
  */
object StreamTransitionsV2 {

  import StreamTransitions.{EvMsg, LastEv, Transition}

  class BufferedProcessor extends StatefulProcessor[Long, EvMsg, Transition] {
    @transient private var buf: ListState[EvMsg] = _
    @transient private var last: ValueState[LastEv] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[EvMsg]("buf",
        Encoders.product[EvMsg], TTLConfig.NONE)
      last = getHandle.getValueState[LastEv]("last",
        Encoders.product[LastEv], TTLConfig.NONE)
    }

    /** Emit every buffered event the watermark has passed, in
      * (ts, event_id) order, chained from the last flushed event;
      * retain the rest. Returns the transitions plus the newest
      * still-buffered event time (−1 if the buffer drained). */
    private def flush(key: Long, wmMs: Long): (Vector[Transition], Long) = {
      val all = buf.get().toArray
      if (all.isEmpty) return (Vector.empty, -1L)
      val (ripe, keep) = all.partition(m => m.tsu / 1000 <= wmMs)
      val out = Vector.newBuilder[Transition]
      if (ripe.nonEmpty) {
        var prev = Option(last.get())
        ripe.sortBy(m => (m.tsu, m.eventId)).foreach { m =>
          prev.foreach(l => out += Transition(key, l.eventType, m.eventType))
          prev = Some(LastEv(m.tsu, m.eventId, m.eventType))
        }
        prev.foreach(last.update)
        buf.clear()
        if (keep.nonEmpty) buf.put(keep)
      }
      (out.result(), if (keep.isEmpty) -1L else keep.map(_.tsu).max)
    }

    /** One timer per key at the newest buffered event: when the global
      * watermark passes it, everything buffered is ripe. */
    private def rearm(newestTsu: Long): Unit = {
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (newestTsu >= 0) getHandle.registerTimer(newestTsu / 1000 + 1)
    }

    override def handleInputRows(key: Long, rows: Iterator[EvMsg],
                                 timerValues: TimerValues): Iterator[Transition] = {
      rows.foreach(buf.appendValue)
      val (out, newest) = flush(key, timerValues.getCurrentWatermarkInMs())
      rearm(newest)
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[Transition] = {
      val (out, newest) = flush(key, timerValues.getCurrentWatermarkInMs())
      rearm(newest)
      out.iterator
    }
  }

  /** events(user_id, ts, event_id, event_type) as a stream → completed
    * transitions, exact under ANY delivery disorder bounded by `delay`. */
  def apply(events: DataFrame, delay: String): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .select(col("user_id").as("userId"), unix_micros(col("ts")).as("tsu"),
        col("event_id").as("eventId"), col("event_type").as("eventType"))
      .as[EvMsg]
      .groupByKey(_.userId)
      .transformWithState(new BufferedProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
