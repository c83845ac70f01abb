package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming OHLC resample: batch q108's cross-batch twin. Each
  * (event_type, hour) bucket keeps a constant-size OHLC summary as
  * state; arrivals fold in one at a time, so the result after any
  * sequence of micro-batches equals the batch aggregate over the union
  * of their rows — OHLC is mergeable (open/close are arg-min/arg-max
  * under the total (ts, event_id) order; high/low/count/sum are plain
  * monoids), so arrival ORDER across batches cannot change the answer:
  * an hour's true open arriving three batches late still wins, because
  * its (ts, event_id) key is smaller.
  *
  * Money rides integer cents (q107's convention) so cross-batch sums
  * are exact — a double accumulator would make the emitted sum depend
  * on batch boundaries.
  *
  * Scale posture: state per bucket is one fixed-size row (9 scalars);
  * buckets give shuffle parallelism; per-arrival work is O(1). This is
  * the live dashboard the q108 backfill reconciles against.
  */
object StreamResample {

  case class EvMsg(eventType: String, hour: Long, tsu: Long, eventId: Long,
                   value: Double, cents: Long)
  case class Ohlc(n: Long, openTsu: Long, openEid: Long, open: Double,
                  high: Double, low: Double,
                  closeTsu: Long, closeEid: Long, close: Double, cents: Long)
  case class OhlcRow(eventType: String, hourStart: Long, n: Long,
                     open: Double, high: Double, low: Double, close: Double,
                     cents: Long)

  /** Per-bucket processor: fold arrivals into the OHLC summary. */
  class BucketProcessor
    extends StatefulProcessor[(String, Long), EvMsg, OhlcRow] {
    @transient private var state: ValueState[Ohlc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Ohlc]("ohlc",
        Encoders.product[Ohlc], TTLConfig.NONE)

    override def handleInputRows(key: (String, Long), rows: Iterator[EvMsg],
                                 timerValues: TimerValues): Iterator[OhlcRow] = {
      var o = Option(state.get()).getOrElse(
        Ohlc(0L, Long.MaxValue, Long.MaxValue, 0.0,
          Double.NegativeInfinity, Double.PositiveInfinity,
          Long.MinValue, Long.MinValue, 0.0, 0L))
      rows.foreach { m =>
        val earlier = m.tsu < o.openTsu ||
          (m.tsu == o.openTsu && m.eventId < o.openEid)
        val later = m.tsu > o.closeTsu ||
          (m.tsu == o.closeTsu && m.eventId > o.closeEid)
        o = Ohlc(o.n + 1,
          if (earlier) m.tsu else o.openTsu,
          if (earlier) m.eventId else o.openEid,
          if (earlier) m.value else o.open,
          math.max(o.high, m.value), math.min(o.low, m.value),
          if (later) m.tsu else o.closeTsu,
          if (later) m.eventId else o.closeEid,
          if (later) m.value else o.close,
          o.cents + m.cents)
      }
      state.update(o)
      Iterator.single(
        OhlcRow(key._1, key._2, o.n, o.open, o.high, o.low, o.close, o.cents))
    }
  }

  /** events with (event_type, ts, event_id, value) → per-batch updated
    * OHLC snapshots per touched (event_type, hour) bucket. */
  def apply(events: DataFrame): Dataset[OhlcRow] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_type").as("eventType"),
        // date_trunc FLOORS (like batch q108); integer `div` truncates
        // toward zero and would shift pre-1970 timestamps one bucket up
        expr("unix_micros(date_trunc('HOUR', ts)) div 1000000").as("hour"),
        unix_micros(col("ts")).as("tsu"), col("event_id").as("eventId"),
        col("value").as("value"),
        (col("value").cast("decimal(18,2)") * lit(100))
          .cast("long").as("cents"))
      .as[EvMsg]
      .groupByKey(m => (m.eventType, m.hour))
      .transformWithState(new BucketProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
