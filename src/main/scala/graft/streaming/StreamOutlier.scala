package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Streaming outlier-threshold maintenance: batch q118's cross-batch
  * twin. Per event type the state is the exact integer sufficient
  * statistics (n, Σx, Σx²) over value-cents — a monoid, so the
  * snapshot after any sequence of micro-batches equals the batch
  * statistics over the union of their rows, and arrival order or
  * batch boundaries cannot change it. Each batch emits the updated
  * triple for every touched group; the 3σ verdict for any value is
  * then the same exact-integer comparison batch q118 makes
  * ((n·x − S)² > 9·(n·Q − S²)), so a consumer can gate arriving rows
  * against the LIVE threshold while the nightly q118 backfill
  * reconciles the history.
  *
  * Verdicts themselves are deliberately NOT emitted: a verdict made
  * mid-stream against partial statistics would disagree with the
  * batch audit once more data arrives — emitting the statistics keeps
  * the stream honest (append-only, monotone) and leaves the
  * threshold-application to the consumer, who knows which trade-off
  * (flag-now vs reconcile-later) their pipeline wants.
  *
  * Scale posture: one fixed-size row (3 longs) per group, O(1) fold
  * per arrival, groups shard the state store. Headroom: Σx² in a
  * BIGINT carries ~10⁴ cent-scale values per 10¹⁰ rows per group;
  * past that the quantum coarsens (q118's documented dial).
  */
object StreamOutlier {

  case class InRow(grp: String, x: Long)
  case class Stats(n: Long, s: Long, q: Long)
  case class OutRow(grp: String, n: Long, s: Long, q: Long)

  class GroupProcessor extends StatefulProcessor[String, InRow, OutRow] {
    @transient private var state: ValueState[Stats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Stats]("stats",
        Encoders.product[Stats], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[InRow],
                                 timerValues: TimerValues): Iterator[OutRow] = {
      var st = Option(state.get()).getOrElse(Stats(0L, 0L, 0L))
      rows.foreach { r =>
        st = Stats(st.n + 1, st.s + r.x, st.q + r.x * r.x)
      }
      state.update(st)
      Iterator.single(OutRow(key, st.n, st.s, st.q))
    }
  }

  /** events(event_type, value) as a stream → per-batch updated
    * (n, Σcents, Σcents²) snapshots per touched event type. */
  def apply(events: DataFrame): Dataset[OutRow] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_type").as("grp"),
        (col("value").cast(DecimalType(18, 2)) * lit(100))
          .cast(LongType).as("x"))
      .as[InRow]
      .groupByKey(_.grp)
      .transformWithState(new GroupProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
