package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

import graft.llm.Dedup

/** Streaming MinHash near-duplicate detection: the banded-LSH face of
  * batch q27, over an unbounded stream (`streaming first-seen dedup`
  * covers EXACT duplicates; this catches near-duplicates ACROSS batches —
  * the case a per-batch q27 re-run can't see).
  *
  * Shape: each document hashes to [[Dedup.MinHashK]] min-hashes (the same
  * md5 hash family as the batch path, computed per-row — no shuffle),
  * each signature splits into [[Dedup.Bands]] banded bucket keys, and the
  * stream re-keys by (band, bucket). `transformWithState` keeps a
  * ListState of (docId, signature) per bucket; a new arrival compares
  * against ONLY its bucket-mates (the LSH candidate set — never the
  * corpus) and emits a pair when the estimated Jaccard (matching
  * signature fraction) clears the threshold.
  *
  * Scale posture: state is partitioned by bucket key across executors and
  * bounded by corpus size × bands, not stream length; the per-arrival
  * work is |bucket| signature comparisons — the streaming equivalent of
  * the batch band-equality join. A production deployment adds a TTL on
  * the bucket state (same dial as [[StatefulV2]]) to window the
  * comparison horizon.
  */
object StreamNearDup {

  case class Doc(docId: Long, text: String)
  case class BandedDoc(bucket: String, docId: Long, sig: Seq[Long])
  case class Member(docId: Long, sig: Seq[Long])
  case class NearDup(docA: Long, docB: Long, estJaccard: Double)

  private val HexChars = "0123456789abcdef".toCharArray

  private def md5hex(s: String): String = {
    // char-table hex — Formatter per byte is ~1µs/call (q143's lesson)
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Per-row MinHash signature — the IDENTICAL hash family as the batch
    * path (`Dedup.minhashSig`): x = int(md5(t)[0:15], 16) mod P, then
    * h_i = min over distinct tokens of (a_i·x + b_i) mod P with the same
    * frozen (a_i, b_i), so streaming and batch signatures agree row for
    * row. */
  def signature(text: String): Seq[Long] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty).distinct
    val xs = toks.map(t =>
      java.lang.Long.parseLong(md5hex(t).substring(0, 15), 16) % Dedup.MinHashP)
    Dedup.Perms.toSeq.map { case (a, b) =>
      if (xs.isEmpty) -1L
      else xs.iterator.map(x => (a * x + b) % Dedup.MinHashP).min
    }
  }

  /** One banded bucket key per band: md5 over the '|'-joined band rows
    * (same encoding as `Dedup.minhashBands`), prefixed with the band
    * index so buckets never collide across bands. */
  def bandKeys(sig: Seq[Long]): Seq[String] =
    (0 until Dedup.Bands).map { j =>
      val band = sig.slice(Dedup.RowsPerBand * j, Dedup.RowsPerBand * (j + 1))
      s"$j|${md5hex(band.mkString("|"))}"
    }

  /** Matching-component fraction of two signatures — the standard MinHash
    * estimator of Jaccard similarity. */
  def estJaccard(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / Dedup.MinHashK

  /** Per-bucket processor: compare each arrival against stored
    * bucket-mates, emit qualifying pairs, append the arrival. Pairs are
    * oriented (min, max) so the downstream cross-band dedup is a plain
    * dropDuplicates. */
  class BucketProcessor(threshold: Double)
    extends StatefulProcessor[String, BandedDoc, NearDup] {
    @transient private var members: ListState[Member] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Member]("members",
        Encoders.product[Member], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BandedDoc],
                                 timerValues: TimerValues): Iterator[NearDup] = {
      // deterministic order within the batch: by docId
      val arrivals = rows.toSeq.sortBy(_.docId)
      val out = Seq.newBuilder[NearDup]
      var seen = members.get().toVector
      val ids = scala.collection.mutable.HashSet.from(seen.iterator.map(_.docId))
      arrivals.foreach { d =>
        if (ids.add(d.docId)) {
          seen.foreach { m =>
            val est = estJaccard(d.sig, m.sig)
            if (est >= threshold)
              out += NearDup(math.min(m.docId, d.docId), math.max(m.docId, d.docId), est)
          }
          val m = Member(d.docId, d.sig)
          members.appendValue(m)
          seen :+= m
        }
      }
      out.result().iterator
    }
  }

  /** Streaming near-dup pairs over a document stream. Each (a, b) pair
    * may surface in several bands; `dropDuplicates` keeps the first
    * (stateful streaming distinct — its state is one row per emitted
    * pair, bounded by the true near-dup count, not the corpus). */
  def nearDups(docs: Dataset[Doc], threshold: Double): Dataset[NearDup] = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
        val sig = signature(d.text)
        bandKeys(sig).map(b => BandedDoc(b, d.docId, sig))
      }
      .groupByKey(_.bucket)
      .transformWithState(new BucketProcessor(threshold),
        TimeMode.None(), OutputMode.Append())
      .dropDuplicates("docA", "docB")
  }
}
