package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Cross-batch (source, term) frequency maintenance — the LIVE feed
  * under the q184 keyness and q185 source-distance scorers: arriving
  * documents tokenize row-locally and a per-(source, term) count
  * monoid folds in state; each batch emits the updated counts for
  * touched keys. A consumer holding the latest snapshot per key runs
  * [[graft.queries.TextStatsQueries.keynessOver]] /
  * [[graft.queries.TextStatsQueries.srcHellingerOver]] on it directly
  * — the same scorer the batch queries use (one scorer, two feeds),
  * so the live keyness board and the nightly audit cannot disagree on
  * anything but recency. Same contract as StreamCms/StreamDrift: ship
  * exact statistics, leave the lossy/derived step to the consumer.
  *
  * The count monoid is what makes the twin exact: per-key addition is
  * associative and commutative, so fold order and batch boundaries
  * cannot change the state — StreamTermCountsSpec asserts boundary
  * invariance, bit-parity with the batch termCounts aggregation, and
  * that the snapshot's keyness equals batch q184 row for row.
  *
  * Scale posture: state is one long per live (source, term) key —
  * vocabulary × sources, not corpus-sized; O(1) fold per occurrence;
  * keys shard the store.
  */
object StreamTermCounts {

  case class TermKey(source: String, t: String)
  case class InRow(source: String, t: String, unit: Long)
  case class OutRow(source: String, t: String, a: Long)

  class TermProcessor extends StatefulProcessor[TermKey, InRow, OutRow] {
    @transient private var state: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long]("a",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: TermKey, rows: Iterator[InRow],
                                 timerValues: TimerValues): Iterator[OutRow] = {
      // exists(), not Option(get()): an unset ValueState[Long] returns
      // null at the erased level, which unboxes to 0L before Option
      // can see it (StreamCms's note)
      val n = (if (state.exists()) state.get() else 0L) + rows.size
      state.update(n)
      Iterator.single(OutRow(key.source, key.t, n))
    }
  }

  /** documents(source, text) as a stream → per-batch updated
    * (source, t, a) snapshots of the live term-count state. */
  def apply(docs: DataFrame): Dataset[OutRow] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .where(col("t") =!= "")
      .select(col("source"), col("t"), lit(1L).as("unit"))
      .as[InRow]
      .groupByKey(r => TermKey(r.source, r.t))
      .transformWithState(new TermProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
