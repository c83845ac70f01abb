package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming CDC materialization: batch q122's cross-batch twin — the
  * continuously-maintained MERGE target (the shape of a compacted
  * changelog topic or a live replica). Per key the state is the
  * max-(ver, op, text) change seen — the SAME total order as batch
  * q122's max(struct), so equal-version changes resolve identically
  * on both paths. Because the winner is determined by that comparison
  * alone — not arrival order — the materialized row per key
  * is invariant to batch boundaries AND to change reordering across
  * batches: a v2 arriving before its v1 still wins, which is the
  * invariant that makes at-least-once, out-of-order change delivery
  * safe.
  *
  * Emits the key's current (ver, op, text) after each batch that
  * touches it; 'D' rows are emitted as tombstones rather than
  * suppressed — a downstream sink needs the tombstone to delete, and
  * the batch q122 reconciliation drops them the same way.
  *
  * Scale posture: state is one row per LIVE key (the merge target's
  * own cardinality — the floor for any materialization), keys shard
  * the store, per-arrival work is one comparison.
  */
object StreamMerge {

  case class Change(docId: Long, ver: Long, op: String, text: String)
  case class Current(ver: Long, op: String, text: String)
  case class MergedRow(docId: Long, ver: Long, op: String, text: String)

  class KeyProcessor extends StatefulProcessor[Long, Change, MergedRow] {
    @transient private var state: ValueState[Current] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Current]("current",
        Encoders.product[Current], TTLConfig.NONE)

    // equal versions break ties by (op, text) — the same lexicographic
    // order as batch q122's max(struct(ver, op, text)) — so the merged
    // state (and thus the TimeTravel log) is arrival-order-invariant
    // even when a key sees two same-version changes in one batch.
    // String comparison must be UTF8String's binary order, NOT Scala's
    // UTF-16 code-unit '>': for supplementary-plane text (U+10000+,
    // whose surrogates sort below U+E000 in UTF-16 but above in UTF-8)
    // the two orders diverge and a same-version tie would materialize
    // a different winner than the batch path (BpeTrain's guard).
    private def utf8Gt(a: String, b: String): Boolean =
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) > 0
    private def wins(c: Change, cur: Current): Boolean =
      c.ver > cur.ver || (c.ver == cur.ver &&
        (utf8Gt(c.op, cur.op) ||
          (c.op == cur.op && utf8Gt(c.text, cur.text))))

    override def handleInputRows(key: Long, rows: Iterator[Change],
                                 timerValues: TimerValues): Iterator[MergedRow] = {
      var cur = Option(state.get())
      rows.foreach { c =>
        if (cur.forall(wins(c, _))) cur = Some(Current(c.ver, c.op, c.text))
      }
      cur.foreach(state.update)
      cur.map(c => MergedRow(key, c.ver, c.op, c.text)).iterator
    }
  }

  /** (doc_id, ver, op, text) changes as a stream → per-batch current
    * state per touched key (tombstones included). */
  def apply(changes: DataFrame): Dataset[MergedRow] = {
    import changes.sparkSession.implicits._
    changes
      .select(col("doc_id").as("docId"), col("ver"), col("op"), col("text"))
      .as[Change]
      .groupByKey(_.docId)
      .transformWithState(new KeyProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
