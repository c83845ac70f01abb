package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming table checksum: batch q110's cross-batch twin — the
  * CONTINUOUS side of anti-entropy. An ingest pipeline folds every
  * arriving row's canonical digest into running (n, additive-mod, xor)
  * accumulators; the nightly batch q110 over the landed table must
  * reproduce the same triple, or rows were lost, duplicated, or
  * mutated between the stream and the sink. Both digests are
  * commutative monoids and the additive one folds mod 2⁶¹−1 per
  * arrival ((a+b) mod M == ((a mod M)+(b mod M)) mod M, so the running
  * residue equals batch q110's one-shot DECIMAL(38) sum fold), which
  * makes the snapshot independent of batch boundaries and arrival
  * order — exactly the property a reconciliation needs.
  *
  * The per-row digest is [[graft.queries.OpsQueries.checksumHash]] —
  * the SAME column expression the batch audit hashes, so stream and
  * batch can never drift on serialization (the r5 q110 NULL-marker
  * lesson applied structurally).
  *
  * Scale posture: state is 3 longs per table; per-arrival work is one
  * codegen'd md5-60 plus two integer folds. Keyed by table name so one
  * query audits a whole ingest fan-in.
  */
object StreamChecksum {

  val Mod: Long = 2305843009213693951L // 2^61 − 1

  case class RowMsg(tbl: String, h: Long)
  case class Digest(n: Long, sum: Long, xor: Long)
  case class DigestRow(tbl: String, nRows: Long, sumDigest: Long, xorDigest: Long)

  class TableProcessor extends StatefulProcessor[String, RowMsg, DigestRow] {
    @transient private var state: ValueState[Digest] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Digest]("digest",
        Encoders.product[Digest], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[RowMsg],
                                 timerValues: TimerValues): Iterator[DigestRow] = {
      var d = Option(state.get()).getOrElse(Digest(0L, 0L, 0L))
      rows.foreach { r =>
        d = Digest(d.n + 1, (d.sum + r.h) % Mod, d.xor ^ r.h)
      }
      state.update(d)
      Iterator.single(DigestRow(key, d.n, d.sum, d.xor))
    }
  }

  /** documents-shaped rows as a stream → per-batch digest snapshots,
    * hash-compatible with batch q110's `documents` row. */
  def documents(docs: DataFrame): Dataset[DigestRow] = {
    import docs.sparkSession.implicits._
    docs
      .select(lit("documents").as("tbl"),
        graft.queries.OpsQueries.checksumHash("documents",
          Seq("doc_id", "text", "lang", "source", "n_chars")).as("h"))
      .as[RowMsg]
      .groupByKey(_.tbl)
      .transformWithState(new TableProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
