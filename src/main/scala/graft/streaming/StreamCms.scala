package graft.streaming

import graft.queries.TextStatsQueries
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Cross-batch Count-Min maintenance — batch q166's streaming twin:
  * the live frequency sketch a serving tier consults while the nightly
  * batch build reconciles. Arriving documents tokenize row-locally,
  * each occurrence hashes ONCE and remixes into its
  * [[TextStatsQueries.CmsDepth]] row buckets (the SAME affine family
  * as the batch build, shared helper — live and nightly sketches are
  * cell-compatible by construction), and a per-(row, bucket) count
  * monoid folds in state.
  * Each batch emits the updated counts for touched cells; a consumer
  * holding the full d×w grid serves point queries with the usual
  * min-over-rows.
  *
  * The CMS monoid is what makes this twin exact: cell-wise addition is
  * the sketch's merge law (CmsSpec proves it on corpus halves), so the
  * stream's fold order and batch boundaries cannot change the state —
  * StreamCmsSpec asserts boundary invariance and bit-parity with the
  * batch q166 grid over the same documents. (The conservative-update
  * CMS variant is deliberately NOT offered here either: its update
  * depends on arrival order, which would break exactly this parity.)
  *
  * Scale posture: state is one long per touched cell — at most
  * d·w = 256 rows regardless of stream length; O(d) row-local hashes
  * per token; keys shard the store.
  */
object StreamCms {

  case class CellKey(j: Long, bucket: Long)
  case class InRow(j: Long, bucket: Long, unit: Long)
  case class OutRow(j: Long, bucket: Long, cnt: Long)

  class CellProcessor extends StatefulProcessor[CellKey, InRow, OutRow] {
    @transient private var state: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Long]("cnt",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: CellKey, rows: Iterator[InRow],
                                 timerValues: TimerValues): Iterator[OutRow] = {
      // exists(), not Option(get()): an unset ValueState[Long] returns
      // null at the erased level, which unboxes to 0L BEFORE Option
      // can see it — Option(get()).getOrElse would work only by that
      // accident of null-unboxing
      val n = (if (state.exists()) state.get() else 0L) + rows.size
      state.update(n)
      Iterator.single(OutRow(key.j, key.bucket, n))
    }
  }

  /** documents(text) as a stream → per-batch updated (j, bucket, cnt)
    * snapshots of the live sketch. */
  def apply(docs: DataFrame): Dataset[OutRow] = {
    import docs.sparkSession.implicits._
    docs
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .where(col("t") =!= "")
      .select(TextStatsQueries.cmsX(col("t")).as("x"))
      .select(explode(TextStatsQueries.cmsJbArray(
        col("x"), TextStatsQueries.CmsWidth)).as("jb"))
      .select(col("jb.j").as("j"), col("jb.bucket").as("bucket"),
        lit(1L).as("unit"))
      .as[InRow]
      .groupByKey(r => CellKey(r.j, r.bucket))
      .transformWithState(new CellProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
