package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming containment detection: batch q96's cross-batch form. The
  * defining case is a quoted excerpt arriving BATCHES after its source
  * document — a per-batch re-run of q96 can't see it; shingle-bucket
  * state can.
  *
  * Shape: each document explodes into its DISTINCT word-8-gram
  * shingles (row-local dedup — no streaming distinct state), hashed to
  * 60-bit md5 prefixes, and re-keys by shingle hash.
  * `transformWithState` keeps the df-capped holder list per shingle
  * (docId + shingle-set size); an arrival emits one hit per stored
  * holder in BOTH orientations (each with the inner side's own
  * shingle count), so every unordered pair's shared shingle is counted
  * exactly once — in the batch where the LATER document arrives. A
  * downstream streaming aggregation per (inner, outer, n_inner) sums
  * the hits and thresholds containment = common / n_inner, and since
  * all of a pair's hits land in one batch, each qualifying pair
  * surfaces as exactly one final update row.
  *
  * Scale posture: state is partitioned by shingle hash and the holder
  * list is capped at `dfCap` — batch q96's max(5, 1%·N) boilerplate
  * bound. A shingle whose holder list is full stops emitting AND
  * stops growing, so per-key state and per-arrival work are both
  * O(dfCap), immune to the d² hot-shingle blowup. (Prefix-semantics
  * caveat vs batch: the batch cap excludes a hot shingle entirely;
  * the stream necessarily counted its first `dfCap` holders before it
  * could know the shingle was hot. Scores for pairs seen before a
  * shingle went hot may therefore include it — containment remains an
  * UNDER-estimate in both engines, never an over-estimate, because
  * dropping postings only removes intersection evidence.)
  */
object StreamContainment {

  case class Doc(docId: Long, text: String)
  case class ShingleMsg(h: Long, docId: Long, nShingles: Long)
  case class Member(docId: Long, nShingles: Long)
  case class Hit(innerDoc: Long, outerDoc: Long, nInner: Long)

  private def h60(s: String): Long = {
    // first 15 hex nibbles read directly from the digest bytes —
    // bit-identical to parseLong(hex.take(15), 16) without the
    // per-byte Formatter cost (q143's lesson)
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Distinct word-8-gram shingles of one document — same shingle
    * definition as the batch path (`Dedup.shingles(_, 8)`). */
  def shingleSet(text: String): Array[String] = {
    val w = text.trim.split("\\s+").filter(_.nonEmpty)
    if (w.length < 8) Array.empty
    else w.sliding(8).map(_.mkString(" ")).distinct.toArray
  }

  /** Per-shingle-bucket processor: df-capped holder list; an arrival
    * emits hits against every stored holder in both orientations, then
    * joins the list (if room remains). Arrivals are processed in docId
    * order for within-batch determinism; re-deliveries are no-ops. */
  class ShingleProcessor(dfCap: Int)
    extends StatefulProcessor[Long, ShingleMsg, Hit] {
    @transient private var holders: ListState[Member] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      holders = getHandle.getListState[Member]("holders",
        Encoders.product[Member], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ShingleMsg],
                                 timerValues: TimerValues): Iterator[Hit] = {
      val arrivals = rows.toSeq.sortBy(_.docId)
      var seen = holders.get().toVector
      val ids = scala.collection.mutable.HashSet.from(seen.iterator.map(_.docId))
      val out = Seq.newBuilder[Hit]
      arrivals.foreach { a =>
        if (!ids.contains(a.docId) && seen.length < dfCap) {
          seen.foreach { m =>
            out += Hit(a.docId, m.docId, a.nShingles)
            out += Hit(m.docId, a.docId, m.nShingles)
          }
          val m = Member(a.docId, a.nShingles)
          holders.appendValue(m)
          seen :+= m
          ids += a.docId
        }
      }
      out.result().iterator
    }
  }

  /** Containment pairs over a document stream: every (inner, outer)
    * with |shingles(inner) ∩ shingles(outer)| / |shingles(inner)| ≥
    * `threshold`, across batches. Update output mode (the final count
    * of a pair lands in one batch, so each qualifying pair surfaces
    * once). */
  def containments(docs: Dataset[Doc], threshold: Double, dfCap: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val hits = docs.flatMap { d =>
        val ss = shingleSet(d.text)
        ss.map(s => ShingleMsg(h60(s), d.docId, ss.length.toLong))
      }
      .groupByKey(_.h)
      .transformWithState(new ShingleProcessor(dfCap),
        TimeMode.None(), OutputMode.Append())
    val cont = col("common").cast("double") / col("n_inner").cast("double")
    hits.groupBy(col("innerDoc").as("inner_doc"),
        col("outerDoc").as("outer_doc"), col("nInner").as("n_inner"))
      .agg(count(lit(1)).as("common"))
      .where(cont >= threshold)
      .select(col("inner_doc"), col("outer_doc"), col("common"),
        col("n_inner"), cont.as("containment"))
  }
}
