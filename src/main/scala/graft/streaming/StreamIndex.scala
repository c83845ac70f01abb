package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming inverted-index maintenance: batch q151's cross-batch twin —
  * the dictionary/postings metadata a long-running corpus ingest keeps
  * current instead of rebuilding the index per drop. Per term the state
  * is (df, tf_total, doc_lo, doc_hi, bottom-[[StreamIndex.HeadK]] doc
  * ids): every field is an order-free bounded monoid — counts and
  * extents are trivial, and the head is the k SMALLEST ids, whose
  * bounded merge is insertion-order-independent — so the snapshot after
  * any micro-batch split equals batch q151's metadata over the union of
  * arrivals. q151's `gap_max` is deliberately absent: the largest
  * posting gap is a property of the FULL sorted postings list, which
  * bounded state cannot carry without the arrival-order contract this
  * family refuses (StreamTransitionsV2's lesson); the batch build owns
  * that column — and since r8 even IT computes gap_max only under a
  * df cap (NULL above — TextStatsQueries.invertedIndex), so the two
  * halves agree that an unbounded-term gap is not a streamable (or
  * cheaply sortable) statistic.
  *
  * Delivery contract: each document's text arrives WHOLE in exactly one
  * row, exactly once (append-only corpus ingest — the same contract the
  * batch build's one-(term,doc)-row-per-pair shape encodes). Per-doc
  * term counts are formed row-locally inside flatMap, so nothing
  * shuffles before the keyed state update.
  *
  * Scale posture: state is 4 longs + ≤ k ids per term — bounded by
  * |vocab|, not stream length; per-arrival work is one tokenize +
  * O(k log k) head merge per touched term.
  */
object StreamIndex {

  val HeadK = 8

  case class TermDoc(term: String, docId: Long, tf: Long)
  case class IdxState(df: Long, tfTotal: Long, docLo: Long, docHi: Long,
                      head: Seq[Long])
  case class IdxRow(term: String, df: Long, tfTotal: Long, docLo: Long,
                    docHi: Long, kUsed: Long, postingsHead: String)

  class TermProcessor extends StatefulProcessor[String, TermDoc, IdxRow] {
    @transient private var state: ValueState[IdxState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[IdxState]("idx",
        Encoders.product[IdxState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[TermDoc],
                                 timerValues: TimerValues): Iterator[IdxRow] = {
      val prior = Option(state.get())
        .getOrElse(IdxState(0L, 0L, Long.MaxValue, Long.MinValue, Seq.empty))
      var df = prior.df
      var tf = prior.tfTotal
      var lo = prior.docLo
      var hi = prior.docHi
      var head = prior.head
      def insert(id: Long, ps: Seq[Long]) = {
        val (below, above) = ps.span(_ <= id)
        (below :+ id) ++ above
      }
      rows.foreach { td =>
        df += 1
        tf += td.tf
        lo = math.min(lo, td.docId)
        hi = math.max(hi, td.docId)
        // bounded maintenance (ADVICE r7): skip ids that cannot enter a
        // full head, O(k) splice otherwise — no per-arrival re-sort
        if (head.length < HeadK) head = insert(td.docId, head)
        else if (td.docId < head.last) head = insert(td.docId, head.init)
      }
      if (df == prior.df) Iterator.empty
      else {
        state.update(IdxState(df, tf, lo, hi, head))
        Iterator.single(IdxRow(key, df, tf, lo, hi, head.size.toLong,
          head.mkString(",")))
      }
    }
  }

  /** document rows (doc_id, text) as a stream → per-batch index
    * metadata snapshots, column-compatible with batch q151 (minus
    * gap_max). */
  def apply(docs: DataFrame): Dataset[IdxRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), trim(col("text")).as("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        text.split("\\s+").toSeq.filter(_.nonEmpty)
          .groupBy(identity)
          .map { case (t, occ) => TermDoc(t, id, occ.size.toLong) }
      }
      .groupByKey(_.term)
      .transformWithState(new TermProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
