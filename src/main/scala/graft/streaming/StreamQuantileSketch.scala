package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming quantile SKETCH: batch q152's cross-batch twin — the
  * bottom-k-by-salted-hash row sample maintained as keyed state. The
  * sample is a KMV-style order-free bounded monoid (the k smallest
  * (priority, cents) pairs of a union do not depend on arrival order or
  * batch boundaries), so the post-batch snapshot equals batch q152's
  * sample over everything seen so far — same priorities, same
  * ⌈p·m/100⌉ order statistics, bit for bit. Where StreamQuantiles
  * (q104's twin) degrades the EXACT quantile to an interval under
  * one-look constraints, this maintains the ESTIMATOR exactly: the
  * stream and the batch job compute the identical statistic, which is
  * what makes the sketch the monitoring primitive — alert thresholds
  * tuned on batch history apply to the stream unchanged.
  *
  * Scale posture: state is ≤ k (priority, cents) pairs + one count per
  * group — fixed bytes regardless of stream length; per-arrival work is
  * one hash + an O(k) bounded merge (O(log k) with a heap; k = 64 makes
  * the array form cheaper in practice).
  */
object StreamQuantileSketch {

  val K = 64
  val Targets: Seq[(String, Long)] = Seq(("p50", 50L), ("p90", 90L), ("p99", 99L))

  case class SampleMsg(grp: String, pri: Long, cents: Long)
  case class SketchState(n: Long, pairs: Seq[(Long, Long)])
  case class SketchRow(grp: String, ql: String, n: Long, kUsed: Long,
                       estCents: Long)

  class GroupProcessor extends StatefulProcessor[String, SampleMsg, SketchRow] {
    @transient private var state: ValueState[SketchState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SketchState]("qsk",
        Encoders.product[SketchState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SampleMsg],
                                 timerValues: TimerValues): Iterator[SketchRow] = {
      val prior = Option(state.get()).getOrElse(SketchState(0L, Seq.empty))
      var n = prior.n
      var pairs = prior.pairs
      val ord = Ordering[(Long, Long)]
      def insert(pair: (Long, Long), ps: Seq[(Long, Long)]) = {
        val (below, above) = ps.span(ord.lteq(_, pair))
        (below :+ pair) ++ above
      }
      rows.foreach { m =>
        n += 1
        val pair = (m.pri, m.cents)
        // bounded maintenance (ADVICE r7): O(1) reject for rows that
        // cannot enter a full sample, one O(k) splice otherwise — never
        // a full re-sort per arrival
        if (pairs.length < K) pairs = insert(pair, pairs)
        else if (ord.lt(pair, pairs.last)) pairs = insert(pair, pairs.init)
      }
      if (n == prior.n) Iterator.empty
      else {
        state.update(SketchState(n, pairs))
        val sorted = pairs.map(_._2).sorted
        val m = sorted.size.toLong
        Targets.iterator.map { case (ql, qp) =>
          SketchRow(key, ql, n, m, sorted(((qp * m + 99L) / 100L - 1L).toInt))
        }
      }
    }
  }

  /** events rows as a stream → per-batch quantile-estimate snapshots,
    * bit-compatible with batch q152 (same salted hash, same cents
    * quantization, same ALL twin-row fan-out). */
  def apply(events: DataFrame): Dataset[SketchRow] = {
    import events.sparkSession.implicits._
    events
      .select(explode(array(col("event_type"), lit("ALL"))).as("grp"),
        call_function("graft_h60",
          concat(lit("qs|"), col("event_id").cast("string"))).as("pri"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .as[SampleMsg]
      .groupByKey(_.grp)
      .transformWithState(new GroupProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
