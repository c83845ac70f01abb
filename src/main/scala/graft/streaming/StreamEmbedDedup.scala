package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

import graft.llm.VectorOps

/** Streaming embedding near-duplicate detection: the vector-space
  * sibling of [[StreamNearDup]] (which handles token near-dups) — each
  * incoming embedding is compared by exact cosine against ONLY its
  * sign-LSH bucket-mates, across batch boundaries.
  *
  * Hash family: the same seed-derived random-projection hyperplanes as
  * batch q32 (`VectorOps.hyperplanes`), evaluated per-row in Scala —
  * a vector hashes to one bucket per table; any pair with high cosine
  * collides in some table with high probability. State is a ListState
  * of (vecId, vector) per (table, bucket), partitioned across executors
  * by bucket key; memory is corpus × tables, never stream-length.
  */
object StreamEmbedDedup {

  case class Vec(vecId: Long, embedding: Seq[Float])
  case class BucketedVec(bucket: String, vecId: Long, v: Seq[Double])
  case class Member(vecId: Long, v: Seq[Double])
  case class NearDup(vecA: Long, vecB: Long, cosine: Double)

  // 4 tables × 12 bits: precision-leaning dials — near-dup candidates
  // (cosine ≥ ~0.9) flip few sign bits, so deeper codes cut bucket
  // occupancy without losing them. Same LCG family as batch q32/q52.
  private val Tables = 4
  private val Bits = 12
  private lazy val Planes = VectorOps.hyperplanes(Tables, Bits, VectorOps.Dim)

  /** Per-row bucket ids, one per table — the Scala twin of
    * `VectorOps.planeBucket` (strict left-to-right dot, same planes). */
  def buckets(v: Seq[Double]): Seq[String] =
    (0 until Tables).map { t =>
      var code = 0L
      var j = 0
      while (j < Bits) {
        val p = Planes(t)(j)
        var d = 0.0
        var i = 0
        while (i < p.length) { d += v(i) * p(i); i += 1 }
        if (d > 0) code |= (1L << j)
        j += 1
      }
      s"$t|$code"
    }

  def cosine(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  class BucketProcessor(threshold: Double)
    extends StatefulProcessor[String, BucketedVec, NearDup] {
    @transient private var members: ListState[Member] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Member]("members",
        Encoders.product[Member], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BucketedVec],
                                 timerValues: TimerValues): Iterator[NearDup] = {
      val arrivals = rows.toSeq.sortBy(_.vecId)
      val out = Seq.newBuilder[NearDup]
      var seen = members.get().toVector
      val ids = scala.collection.mutable.HashSet.from(seen.iterator.map(_.vecId))
      arrivals.foreach { a =>
        if (ids.add(a.vecId)) {
          seen.foreach { m =>
            val c = cosine(a.v, m.v)
            if (c >= threshold)
              out += NearDup(math.min(m.vecId, a.vecId),
                math.max(m.vecId, a.vecId), c)
          }
          val m = Member(a.vecId, a.v)
          members.appendValue(m)
          seen :+= m
        }
      }
      out.result().iterator
    }
  }

  /** Streaming near-dup pairs over an embedding stream; a pair colliding
    * in several tables is emitted once (stateful distinct bounded by the
    * true near-dup count). */
  def nearDups(vecs: Dataset[Vec], threshold: Double): Dataset[NearDup] = {
    import vecs.sparkSession.implicits._
    vecs.flatMap { r =>
        val v = r.embedding.map(_.toDouble)
        buckets(v).map(b => BucketedVec(b, r.vecId, v))
      }
      .groupByKey(_.bucket)
      .transformWithState(new BucketProcessor(threshold),
        TimeMode.None(), OutputMode.Append())
      .dropDuplicates("vecA", "vecB")
  }
}
