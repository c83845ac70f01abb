package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.KmvBuffer

/** Streaming column profile: batch q111's cross-batch twin — the
  * optimizer statistics a long-running ingest maintains instead of
  * re-running ANALYZE TABLE. Per profiled column the state is
  * (n, n_null, KMV sketch): the counts are trivial monoids and the
  * sketch is [[KmvBuffer]] — the same k-smallest-distinct-hashes
  * structure the batch side aggregates natively via `graft_kmv` — so
  * the snapshot after any micro-batch split equals batch q111's
  * statistics over the union of the arrivals, bit for bit (the hash is
  * the engine-wide deterministic md5-60).
  *
  * Emits (col_name, n, n_null, k_used, kth_hash) per touched column
  * per batch; the distinct-count ESTIMATE is derived downstream the
  * same way q111 derives it — the stream ships the sufficient
  * statistics, not a lossy float (q118/q119's convention).
  *
  * Scale posture: state is 2 longs + ≤ K hashes per column — bounded
  * by the schema width times K, not the stream length; per-arrival
  * work is one hash + an O(log K) sketch update.
  */
object StreamProfile {

  val ProfK = 64

  case class CellMsg(colName: String, h: Long, isNull: Boolean)
  case class Prof(n: Long, nNull: Long, sketch: Seq[Long])
  case class ProfRow(colName: String, n: Long, nNull: Long,
                     kUsed: Long, kthHash: Long)

  class ColumnProcessor extends StatefulProcessor[String, CellMsg, ProfRow] {
    @transient private var state: ValueState[Prof] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Prof]("prof",
        Encoders.product[Prof], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[CellMsg],
                                 timerValues: TimerValues): Iterator[ProfRow] = {
      val prior = Option(state.get()).getOrElse(Prof(0L, 0L, Seq.empty))
      val buf = new KmvBuffer(ProfK)
      prior.sketch.foreach(buf.update)
      var n = prior.n
      var nNull = prior.nNull
      rows.foreach { m =>
        n += 1
        if (m.isNull) nNull += 1 else buf.update(m.h)
      }
      val sk = buf.set.toSeq
      state.update(Prof(n, nNull, sk))
      Iterator.single(ProfRow(key, n, nNull, sk.size.toLong,
        if (sk.isEmpty) 0L else sk.last))
    }
  }

  /** events rows as a stream → per-batch profile snapshots for the four
    * q111 columns, hash-compatible with the batch job. */
  def apply(events: DataFrame): Dataset[ProfRow] = {
    import events.sparkSession.implicits._
    def cell(name: String, v: org.apache.spark.sql.Column) = struct(
      lit(name).as("colName"),
      coalesce(call_function("graft_h60",
        concat(lit(s"prof|$name|"), v.cast("string"))), lit(0L)).as("h"),
      v.cast("string").isNull.as("isNull"))
    events
      .select(explode(array(
        cell("event_type", col("event_type")),
        cell("user_id", col("user_id")),
        cell("value", col("value").cast("decimal(18,2)")),
        cell("props", col("props")))).as("c"))
      .select(col("c.colName"), col("c.h"), col("c.isNull"))
      .as[CellMsg]
      .groupByKey(_.colName)
      .transformWithState(new ColumnProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
