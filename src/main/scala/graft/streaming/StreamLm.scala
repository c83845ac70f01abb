package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Cross-batch bigram-LM count maintenance — batch q172's streaming
  * twin: the live n-gram statistics a serving tier consults (quality
  * gates, next-token heuristics) while the nightly batch build
  * reconciles. Arriving documents tokenize row-locally with q172's
  * exact convention (whitespace split of the trimmed text, adjacent
  * pairs in document order, no empty-token filter), and a per-bigram
  * count monoid folds in state; each batch emits the updated count for
  * every touched pair. A consumer holding the count table serves
  * p(w2|w1) = (c12+1)/(c1+V) with q172's arithmetic — c1 is the
  * history marginal Σ_w2 c(w1, w2), a consumer-side rollup of the
  * emitted rows.
  *
  * The count monoid is what makes the twin exact: addition is
  * commutative and associative, so batch boundaries and arrival order
  * cannot change the state — StreamLmSpec asserts boundary invariance
  * and parity with the batch-derived count table over the same
  * documents.
  *
  * Scale posture: state is one long per DISTINCT bigram —
  * Heaps-law-bounded on real text, never stream-length-bounded; keys
  * shard the store; per-arrival work is row-local tokenization.
  */
object StreamLm {

  case class PairKey(t1: String, t2: String)
  case class InRow(t1: String, t2: String, unit: Long)
  case class OutRow(t1: String, t2: String, cnt: Long)

  class PairProcessor extends StatefulProcessor[PairKey, InRow, OutRow] {
    @transient private var state: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long]("cnt",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: PairKey, rows: Iterator[InRow],
                                 timerValues: TimerValues): Iterator[OutRow] = {
      // exists(), not Option(get()): an unset ValueState[Long] returns
      // null at the erased level, which unboxes to 0L before Option
      // can see it (StreamCms's documented trap)
      val n = (if (state.exists()) state.get() else 0L) + rows.size
      state.update(n)
      Iterator.single(OutRow(key.t1, key.t2, n))
    }
  }

  /** documents(text) as a stream → per-batch updated (t1, t2, cnt)
    * snapshots of the live bigram table. */
  def apply(docs: DataFrame): Dataset[OutRow] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("text")).as[String]
      .flatMap { text =>
        val w = text.trim.split("\\s+")
        if (w.length >= 2) (0 until w.length - 1).iterator
          .map(i => InRow(w(i), w(i + 1), 1L))
        else Iterator.empty
      }
      .groupByKey(r => PairKey(r.t1, r.t2))
      .transformWithState(new PairProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
