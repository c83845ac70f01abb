package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.MgBuffer

/** Streaming heavy hitters: batch q100's cross-batch twin. The batch
  * two-pass (sketch → exact recount) needs the whole corpus twice; a
  * stream gets one look, so the sketch IS the state and the guarantee
  * carries over micro-batch merges (Misra-Gries buffers are mergeable —
  * the same graft.functions.MgBuffer the q100 aggregate rides).
  *
  * Shape: tokens re-key by `pmod(xxhash64(token), buckets)`; a token's
  * ENTIRE stream lands in exactly one bucket, so each bucket's
  * capacity-k MgBuffer gives the per-bucket retention guarantee
  * (undercount ≤ n_b/(k+1), n_b = bucket stream length ≤ n), which
  * implies the global one: any token with total frequency > n/(k+1) is
  * retained by its bucket's sketch, whatever the batch arrival order.
  * After each batch every touched bucket emits a candidate snapshot
  * (bucket, n_b, token, lower-bound count), so the union of the latest
  * snapshot per bucket is the live candidate superset a downstream
  * exact recount (or alerting rule) consumes.
  *
  * Scale posture: state is `buckets` rows of ≤ capacity counters —
  * fixed bytes regardless of vocabulary or stream length (the failure
  * mode this replaces is per-token keyed state: one state row per
  * distinct token, unbounded). Buckets give shuffle parallelism; the
  * per-arrival work is the O(1) amortized MG update.
  */
object StreamHeavyHitters {

  case class TokMsg(bucket: Long, token: String)
  case class MgSnapshot(n: Long, tokens: Array[String], counts: Array[Long])
  case class Candidate(bucket: Long, n: Long, token: String, cnt: Long)

  /** Per-bucket processor: one MgBuffer as value state, rebuilt from its
    * (token, count) rows each batch; emits the post-batch candidates. */
  class BucketProcessor(capacity: Int)
    extends StatefulProcessor[Long, TokMsg, Candidate] {
    @transient private var state: ValueState[MgSnapshot] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[MgSnapshot]("mg",
        Encoders.product[MgSnapshot], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TokMsg],
                                 timerValues: TimerValues): Iterator[Candidate] = {
      val b = new MgBuffer(capacity)
      Option(state.get()).foreach { s =>
        b.n = s.n
        s.tokens.indices.foreach(i => b.counts.update(s.tokens(i), s.counts(i)))
      }
      rows.foreach(m => b.update(m.token))
      val toks = b.counts.keysIterator.toArray
      java.util.Arrays.sort(toks, implicitly[Ordering[String]])
      state.update(MgSnapshot(b.n, toks, toks.map(b.counts)))
      toks.iterator.map(t => Candidate(key, b.n, t, b.counts(t)))
    }
  }

  /** tokens (one string column) → per-batch candidate snapshots. */
  def apply(tokens: DataFrame, buckets: Int, capacity: Int): Dataset[Candidate] = {
    import tokens.sparkSession.implicits._
    tokens
      .select(pmod(xxhash64(col(tokens.columns.head)), lit(buckets.toLong))
          .as("bucket"),
        col(tokens.columns.head).as("token"))
      .as[TokMsg]
      .groupByKey(_.bucket)
      .transformWithState(new BucketProcessor(capacity),
        TimeMode.None(), OutputMode.Append())
  }
}
