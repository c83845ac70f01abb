package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming twin of batch q70's ordered funnel (view → click-after-view
  * → purchase-after-that-click), exact under arbitrary delivery disorder
  * bounded by the watermark delay — [[StreamTransitionsV2]]'s
  * buffer-until-watermark idiom applied to a funnel state machine.
  *
  * Why the fold is exact: q70's chain is three conditional minima
  * (tv = min view ts; tc = min click ts > tv; tp = min purchase ts
  * > tc). Folded over events in (ts, event_id) order these minima are
  * simply the FIRST event satisfying each arm — the first view is the
  * min view, and once tv is final every later qualifying click arrives
  * after it, so the first one seen is the min. Strict `>` makes
  * same-timestamp ties insensitive to fold order: a click at exactly tv
  * fails the strict comparison whether or not the view folded first,
  * matching the batch semantics. So buffering until the watermark and
  * flushing in order reproduces the batch result on the events the
  * watermark admitted — the same exactness contract as
  * StreamTransitionsV2, with late-beyond-watermark events the
  * irreducible residue.
  *
  * Emits one StageReach row the moment a user's funnel advances — the
  * incremental form of q70's stage counts (count distinct userId per
  * stage downstream equals the batch numbers; a user emits each stage
  * at most once, so the append stream IS the distinct set).
  *
  * Scale posture: per-user state is three Longs plus the
  * watermark-horizon buffer (delay-bounded); users shard the RocksDB
  * store; flush is O(b log b) in the buffered count.
  */
object StreamFunnel {

  import StreamTransitions.EvMsg

  /** tv/tc/tp as micros, -1 = stage not yet reached. */
  case class FunnelSt(tv: Long, tc: Long, tp: Long)
  /** stage ∈ {1_view, 2_click_after_view, 3_purchase_after_click} —
    * q70's stage labels, reached at event-time `tsu`. */
  case class StageReach(userId: Long, stage: String, tsu: Long)

  class FunnelProcessor extends StatefulProcessor[Long, EvMsg, StageReach] {
    @transient private var buf: ListState[EvMsg] = _
    @transient private var st: ValueState[FunnelSt] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[EvMsg]("buf",
        Encoders.product[EvMsg], TTLConfig.NONE)
      st = getHandle.getValueState[FunnelSt]("st",
        Encoders.product[FunnelSt], TTLConfig.NONE)
    }

    /** Fold every watermark-ripe buffered event into the funnel state in
      * (ts, event_id) order; emit a StageReach per stage transition. */
    private def flush(key: Long, wmMs: Long): (Vector[StageReach], Long) = {
      val all = buf.get().toArray
      if (all.isEmpty) return (Vector.empty, -1L)
      val (ripe, keep) = all.partition(m => m.tsu / 1000 <= wmMs)
      val out = Vector.newBuilder[StageReach]
      if (ripe.nonEmpty) {
        var s = Option(st.get()).getOrElse(FunnelSt(-1L, -1L, -1L))
        ripe.sortBy(m => (m.tsu, m.eventId)).foreach { m =>
          if (s.tv < 0 && m.eventType == "view") {
            s = s.copy(tv = m.tsu)
            out += StageReach(key, "1_view", m.tsu)
          } else if (s.tv >= 0 && s.tc < 0 && m.eventType == "click" &&
              m.tsu > s.tv) {
            s = s.copy(tc = m.tsu)
            out += StageReach(key, "2_click_after_view", m.tsu)
          } else if (s.tc >= 0 && s.tp < 0 && m.eventType == "purchase" &&
              m.tsu > s.tc) {
            s = s.copy(tp = m.tsu)
            out += StageReach(key, "3_purchase_after_click", m.tsu)
          }
        }
        st.update(s)
        buf.clear()
        if (keep.nonEmpty) buf.put(keep)
      }
      (out.result(), if (keep.isEmpty) -1L else keep.map(_.tsu).max)
    }

    private def rearm(newestTsu: Long): Unit = {
      getHandle.listTimers().foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (newestTsu >= 0) getHandle.registerTimer(newestTsu / 1000 + 1)
    }

    override def handleInputRows(key: Long, rows: Iterator[EvMsg],
                                 timerValues: TimerValues): Iterator[StageReach] = {
      rows.foreach(buf.appendValue)
      val (out, newest) = flush(key, timerValues.getCurrentWatermarkInMs())
      rearm(newest)
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[StageReach] = {
      val (out, newest) = flush(key, timerValues.getCurrentWatermarkInMs())
      rearm(newest)
      out.iterator
    }
  }

  /** events(user_id, ts, event_id, event_type) as a stream → funnel
    * stage-reach records, exact under any disorder within `delay`. */
  def apply(events: DataFrame, delay: String): Dataset[StageReach] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", delay)
      .select(col("user_id").as("userId"), unix_micros(col("ts")).as("tsu"),
        col("event_id").as("eventId"), col("event_type").as("eventType"))
      .as[EvMsg]
      .groupByKey(_.userId)
      .transformWithState(new FunnelProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
