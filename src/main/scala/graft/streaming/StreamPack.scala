package graft.streaming

import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.{Dataset, Encoders}

/** Streaming sequence packing: batch q79's concat-then-chunk assignment
  * (docs → fixed-token-budget training sequences, packed per source
  * shard) computed IN FLIGHT, so ingestion emits training-ready pack
  * assignments without a batch pass.
  *
  * State per source shard is two longs — the running token offset and
  * the shard's arrival sequence — via `transformWithState`; documents
  * arriving across micro-batches continue the same token stream exactly
  * where the previous batch left off (the spec proves stream==batch on
  * an identically-ordered corpus). Within a batch, rows for a shard are
  * packed in (doc_id) order for determinism regardless of shuffle
  * arrival order.
  *
  * Scale: state is O(#shards), not O(#docs); each shard's packing is
  * independent, so parallelism is the shard count — the same contract
  * as the batch window's partitionBy(source).
  */
object StreamPack {

  case class Doc(docId: Long, source: String, nTok: Long)
  case class Packed(docId: Long, source: String, nTok: Long,
      packId: Long, offset: Long)

  class PackProcessor(budget: Long)
    extends StatefulProcessor[String, Doc, Packed] {
    @transient private var cursor: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cursor = getHandle.getValueState[Long]("cursor",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Doc],
        timerValues: TimerValues): Iterator[Packed] = {
      var off = Option(cursor.get()).getOrElse(0L)
      // deterministic within-batch order, independent of arrival order
      val out = rows.toSeq.sortBy(_.docId).map { d =>
        val p = Packed(d.docId, key, d.nTok, off / budget, off)
        off += d.nTok
        p
      }
      cursor.update(off)
      out.iterator
    }
  }

  /** Pack a (streaming) Dataset of docs into `budget`-token sequences
    * per source shard. */
  def packed(docs: Dataset[Doc], budget: Long = 256L): Dataset[Packed] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .transformWithState(new PackProcessor(budget),
        TimeMode.None(), OutputMode.Append())
  }
}
