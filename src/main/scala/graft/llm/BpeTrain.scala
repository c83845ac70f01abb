package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** DISTRIBUTED BPE vocabulary induction (Sennrich et al. 2016) — the
  * training half of the tokenizer pipeline, previously only available
  * as driver-side tooling (scripts/train_bpe_merges.py); q97 ranks the
  * round-1 candidates and q99 applies a frozen table, this trains one
  * in-engine. Fixed 16 synchronous rounds; each round merges the
  * corpus-wide most frequent adjacent symbol pair, ties broken exactly
  * like the script (highest count, then lexicographically smallest
  * flattened pair — with the script's longer-wins-on-prefix quirk,
  * reproduced via a max-codepoint sentinel suffix in the ordering key).
  *
  * Scale shape: the CORPUS is scanned once — the word-frequency vocab
  * build — and every round after that runs on the vocab table (distinct
  * words × symbol arrays, orders of magnitude smaller than the corpus;
  * on real text, Heaps'-law-bounded). Per round: one map-side-combined
  * pair count into an (alphabet² + merges)-bounded key space, ONE
  * scalar argmax row to the driver (a planning decision, q30/q73's
  * Gate discipline — never row data), and a row-local rewrite of the
  * symbol arrays. Lineage is truncated per round (localCheckpoint,
  * q91/q125's iteration discipline).
  */
object BpeTrain {

  val Rounds = 16

  case class VocabWord(syms: Array[String], cnt: Long)

  /** Left-to-right single-pair rewrite — the same loop Bpe.encodeWith
    * runs with a 1-entry table; duplicated in primitive form so the
    * trainer has no dependency on the frozen table's ranking. */
  def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** The trained merge table: (lhs, rhs, pair count at merge time) per
    * round, in training order. */
  def train(s: SparkSession, dir: String, rounds: Int = Rounds)
    : Seq[(String, String, Long)] = {
    import s.implicits._
    // One corpus scan builds the vocab; the ROUND LOOP then iterates a
    // plain-object RDD (PqTrain.trainSub's idiom): each round is ONE
    // shuffle-free mapPartitions producing a bounded pair-count
    // partial — the pair key space is (alphabet + merges)²-bounded as
    // documented — merged and arg-maxed on the driver with the EXACT
    // ordering the old SQL orderBy used. The old Dataset loop paid a
    // shuffled aggregation plus a localCheckpoint job per round; the
    // symbol rewrite now rides lazily into the next round's pass.
    val vocab0 = Tables.documents(s, dir)
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .where(col("t") =!= "")
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .map { case (w, c) => VocabWord(w.map(_.toString).toArray, c) }
    var vocab = vocab0.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    var prev: org.apache.spark.rdd.RDD[VocabWord] = null
    // Spark's SQL string order is UTF8 BINARY order; the driver-side
    // argmax must compare the same way or a non-ASCII tie could pick a
    // different merge than the old plan did.
    def u8Less(x: String, y: String): Boolean =
      org.apache.spark.unsafe.types.UTF8String.fromString(x)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y)) < 0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val partials = vocab.mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[(String, String), Long]
        it.foreach { vw =>
          val ss = vw.syms
          var i = 0
          while (i < ss.length - 1) {
            val k = (ss(i), ss(i + 1))
            m.update(k, m.getOrElse(k, 0L) + vw.cnt)
            i += 1
          }
        }
        Iterator.single(m)
      }.collect()
      // the pass above materialized `vocab`; the previous round's
      // blocks are now safe to drop (nothing recomputes through them)
      if (prev != null) { prev.unpersist(false); prev = null }
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      partials.foreach(_.foreach { case (k, c) =>
        counts.update(k, counts.getOrElse(k, 0L) + c)
      })
      if (counts.isEmpty) done = true
      else {
        // script-exact tie order: count desc, then flattened pair with
        // a U+FFFF sentinel appended — plain string order ranks a
        // strict prefix BEFORE its extensions ("ab" < "abc"), the
        // script's negated-ordinal list key ranks it AFTER; the
        // sentinel (greater than any corpus char) flips exactly the
        // prefix case. Third key: lhs asc.
        var best: ((String, String), Long) = null
        counts.foreach { case e @ ((a, b), c) =>
          if (best == null) best = e
          else {
            val ((ba, bb), bc) = best
            val better = c > bc || (c == bc && {
              val k1 = a + b + "\uffff"; val k2 = ba + bb + "\uffff"
              u8Less(k1, k2) || (k1 == k2 && u8Less(a, ba))
            })
            if (better) best = e
          }
        }
        val ((a, b), c) = best
        merges += ((a, b, c))
        prev = vocab
        vocab = vocab.map(vw => VocabWord(applyMerge(vw.syms, a, b), vw.cnt))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      }
      r += 1
    }
    vocab.unpersist(false)
    if (prev != null) prev.unpersist(false)
    merges.toSeq
  }

  /** q131 — the merge table as a DataFrame: (rnk, lhs, rhs, cnt). The
    * table itself is driver-resident by construction (16 scalar argmax
    * results); its derivation is the distributed part. */
  def bpeTrainQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    train(s, dir).zipWithIndex
      .map { case ((a, b, c), i) => (i + 1L, a, b, c) }
      .toDF("rnk", "lhs", "rhs", "cnt")
  }
}
