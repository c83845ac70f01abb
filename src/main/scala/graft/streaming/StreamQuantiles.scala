package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming quantiles: batch q104's cross-batch twin. The batch plan
  * narrows with a data-derived histogram and then reads the EXACT order
  * statistic off a second pass; a stream gets one look, so the
  * histogram IS the state and the answer degrades honestly from a
  * point to an INTERVAL: after every batch, each group emits, per
  * quantile target, the tightest [lo, hi) bucket bound that provably
  * contains the running exact quantile of everything seen so far.
  * Bucket counts are mergeable (they're just sums), so the guarantee
  * is independent of how arrivals split across micro-batches.
  *
  * The value range [lo, hi) is FROZEN at deployment (the same posture
  * as the frozen IVF/PQ/BPE artifacts: train on history, hold fixed in
  * the stream); out-of-range arrivals are counted exactly in two
  * overflow registers, so ranks stay exact and a quantile that falls
  * into an overflow region reports an unbounded side (±∞) instead of a
  * silently-clamped wrong number.
  *
  * Scale posture: state is `buckets + 3` longs per group — fixed bytes
  * regardless of stream length or value cardinality; per-arrival work
  * is O(1); groups give shuffle parallelism. Rank arithmetic is the
  * exact BIGINT r = ⌈p·n/100⌉ of q104, so batch and stream agree on
  * which order statistic is being bounded.
  */
object StreamQuantiles {

  case class ValMsg(grp: String, v: Double)
  case class Hist(below: Long, above: Long, counts: Array[Long])
  case class QuantileBound(grp: String, ql: String, n: Long,
                           lo: Double, hi: Double)

  val Targets: Seq[(String, Long)] = Seq(("p50", 50L), ("p90", 90L), ("p99", 99L))

  /** Per-group processor: a fixed-width histogram over the frozen range
    * as value state; emits the post-batch quantile bounds. */
  class GroupProcessor(lo: Double, hi: Double, buckets: Int)
    extends StatefulProcessor[String, ValMsg, QuantileBound] {
    @transient private var state: ValueState[Hist] = _
    private val width = (hi - lo) / buckets
    // one edges array drives BOTH the bucketing comparisons and the
    // emitted bounds, so a value counted in bucket b provably lies in
    // [edges(b), edges(b+1)) — recomputing lo + b*width at emit time
    // can drift by ulps from the (v-lo)/width bucketing and break the
    // containment guarantee at bucket boundaries. The last edge is
    // clamped to the frozen hi.
    private val edges: Array[Double] =
      Array.tabulate(buckets + 1)(i => if (i == buckets) hi else lo + i * width)

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Hist]("hist",
        Encoders.product[Hist], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ValMsg],
                                 timerValues: TimerValues): Iterator[QuantileBound] = {
      val h = Option(state.get())
        .getOrElse(Hist(0L, 0L, new Array[Long](buckets)))
      var below = h.below; var above = h.above
      val counts = h.counts
      rows.foreach { m =>
        if (m.v < lo) below += 1
        else if (m.v >= hi) above += 1
        else {
          // fp guard: (v-lo)/width can round up to `buckets` when v is
          // the largest double below hi; then correct against the edges
          // array so edges(b) <= v < edges(b+1) holds exactly
          var b = math.min(buckets - 1, math.max(0, ((m.v - lo) / width).toInt))
          while (b > 0 && m.v < edges(b)) b -= 1
          while (b < buckets - 1 && m.v >= edges(b + 1)) b += 1
          counts(b) += 1
        }
      }
      state.update(Hist(below, above, counts))
      val n = below + above + counts.sum
      Targets.iterator.map { case (ql, qp) =>
        val r = (qp * n + 99L) / 100L
        if (n == 0L)
          QuantileBound(key, ql, 0L, Double.NegativeInfinity, Double.PositiveInfinity)
        else if (r <= below)
          QuantileBound(key, ql, n, Double.NegativeInfinity, lo)
        else {
          var cum = below; var b = 0; var found = -1
          while (b < buckets && found < 0) {
            cum += counts(b)
            if (r <= cum) found = b
            b += 1
          }
          if (found < 0) QuantileBound(key, ql, n, hi, Double.PositiveInfinity)
          else QuantileBound(key, ql, n, edges(found), edges(found + 1))
        }
      }
    }
  }

  /** (grp string, v double) rows → per-batch quantile bounds. */
  def apply(values: DataFrame, lo: Double, hi: Double,
            buckets: Int): Dataset[QuantileBound] = {
    import values.sparkSession.implicits._
    val Seq(gc, vc) = values.columns.toSeq
    values.select(col(gc).as("grp"), col(vc).cast("double").as("v"))
      .as[ValMsg]
      .groupByKey(_.grp)
      .transformWithState(new GroupProcessor(lo, hi, buckets),
        TimeMode.None(), OutputMode.Append())
  }
}
