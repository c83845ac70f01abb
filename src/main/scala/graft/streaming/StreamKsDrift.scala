package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Streaming exact two-sample KS maintenance: batch q137's cross-batch
  * twin (r7 verdict item 6; StreamDrift covers PSI only). The split
  * point between the reference half and the current half is FROZEN at
  * deploy time (q137 derives it from the corpus's temporal extent;
  * re-estimating it mid-stream would move the reference under the
  * monitor — StreamDrift's frozen-edges discipline), and each arriving
  * value folds into per-(group, value) half-count state.
  *
  * The distinct-value collapse is exactly what makes exact KS
  * streamable: q137's pieces reduce to per-(grp, v) count PAIRS — a
  * commutative monoid, O(1) per arrival, mergeable across batches and
  * partitions — while the only non-mergeable step, the max over the
  * cumulative-difference walk, is a |distinct values|-sized batch
  * computation over the snapshot. [[ksOf]] is that extraction, q137's
  * expressions verbatim (ks_num = max |cum_a·n_b − cum_b·n_a| with the
  * division left to the consumer), so live KS = ksOf(current counts)
  * and the nightly batch q137 reconciles bit-identically.
  *
  * Scale posture: state is two longs per (group, distinct cents value)
  * — the store shards on the key, no per-group hotspot; emission per
  * batch is only the touched keys' updated counts.
  */
object StreamKsDrift {

  case class KsKey(grp: String, v: Long)
  case class InRow(grp: String, v: Long, half: Long)
  case class CountRow(grp: String, v: Long, cA: Long, cB: Long)
  case class Counts(cA: Long, cB: Long)

  class CountProcessor extends StatefulProcessor[KsKey, InRow, CountRow] {
    @transient private var state: ValueState[Counts] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Counts]("ksc",
        Encoders.product[Counts], TTLConfig.NONE)

    override def handleInputRows(key: KsKey, rows: Iterator[InRow],
                                 timerValues: TimerValues): Iterator[CountRow] = {
      val prior = Option(state.get()).getOrElse(Counts(0L, 0L))
      var a = prior.cA
      var b = prior.cB
      rows.foreach { r => if (r.half == 0L) a += 1 else b += 1 }
      if (a == prior.cA && b == prior.cB) Iterator.empty
      else {
        state.update(Counts(a, b))
        Iterator.single(CountRow(key.grp, key.v, a, b))
      }
    }
  }

  /** events rows (event_type, tu micro-epoch BIGINT, value) as a
    * stream → per-batch updated (grp, v, c_a, c_b) half counts under
    * the FROZEN split `tmid` (q137's `tu < tmid ⇒ half 0`). */
  def apply(events: DataFrame, tmid: Long): Dataset[CountRow] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_type").as("grp"),
        (col("value").cast(DecimalType(18, 2)) * lit(100))
          .cast(LongType).as("v"),
        when(col("tu") < lit(tmid), lit(0L)).otherwise(lit(1L)).as("half"))
      .as[InRow]
      .groupByKey(r => KsKey(r.grp, r.v))
      .transformWithState(new CountProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** q137's extraction over a current-counts snapshot
    * (grp, v, c_a, c_b) — the same window + integer pieces as the
    * batch audit, run on |distinct values| rows, not the corpus. */
  def ksOf(snap: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = snap.groupBy(col("grp"))
      .agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
    snap
      .withColumn("cum_a", sum(col("c_a")).over(w))
      .withColumn("cum_b", sum(col("c_b")).over(w))
      .join(broadcast(tot), Seq("grp"))
      .select(col("grp"), col("n_a"), col("n_b"),
        abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a")).as("d"))
      .groupBy(col("grp"), col("n_a"), col("n_b"))
      .agg(max(col("d")).as("ks_num"))
      .select(col("grp"), col("n_a"), col("n_b"), col("ks_num"))
      .orderBy(col("grp"))
  }
}
