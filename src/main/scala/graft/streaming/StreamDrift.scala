package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Streaming drift-histogram maintenance: batch q136's cross-batch
  * twin — the LIVE side of a PSI drift monitor. The reference window's
  * bin edges are frozen at deploy time (the global [vmn, vmx] the
  * batch audit derived — passed in, never re-estimated mid-stream:
  * shifting edges under a drift monitor is the classic way to hide
  * the drift being monitored); arriving values bucket row-locally
  * into the same 10 equi-width bins and a per-(group, bin) count
  * monoid folds in state. Each batch emits the updated counts for
  * touched (group, bin) pairs; the consumer joins them against the
  * frozen reference counts (q136's n_a) and takes the PSI division —
  * same contract as StreamOutlier (ship exact statistics, leave the
  * lossy step to the consumer, let the nightly q136 backfill
  * reconcile).
  *
  * Out-of-range values (the stream drifting OUTSIDE the reference
  * extent — the strongest drift signal there is) clamp into the edge
  * bins, matching q136's arithmetic on its own extent, and so are
  * never silently dropped.
  *
  * Scale posture: state is one long per (group, bin) — groups × 10
  * rows total, regardless of stream length; O(1) fold per arrival;
  * keys shard the store.
  */
object StreamDrift {

  val Bins = 10L

  case class BinRow(grp: String, bin: Long)
  case class InRow(grp: String, bin: Long, unit: Long)
  case class OutRow(grp: String, bin: Long, n: Long)

  class BinProcessor extends StatefulProcessor[BinRow, InRow, OutRow] {
    @transient private var state: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long]("n",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: BinRow, rows: Iterator[InRow],
                                 timerValues: TimerValues): Iterator[OutRow] = {
      val n = Option(state.get()).getOrElse(0L) + rows.size
      state.update(n)
      Iterator.single(OutRow(key.grp, key.bin, n))
    }
  }

  /** events(event_type, value) as a stream → per-batch updated
    * (group, bin, count) snapshots under the FROZEN [vmn, vmx] edges. */
  def apply(events: DataFrame, vmn: Long, vmx: Long): Dataset[OutRow] = {
    import events.sparkSession.implicits._
    val cents = (col("value").cast(DecimalType(18, 2)) * lit(100))
      .cast(LongType)
    val raw = expr(s"((v - ${vmn}L) * $Bins) div (${vmx}L - ${vmn}L + 1)")
    events
      .select(col("event_type").as("grp"), cents.as("v"))
      // clamp: out-of-reference-range values land in the edge bins
      .select(col("grp"),
        least(greatest(raw, lit(0L)), lit(Bins - 1)).as("bin"),
        lit(1L).as("unit"))
      .as[InRow]
      .groupByKey(r => BinRow(r.grp, r.bin))
      .transformWithState(new BinProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
