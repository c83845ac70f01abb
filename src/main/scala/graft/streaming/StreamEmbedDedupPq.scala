package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

import graft.llm.{PqCodebook, VectorOps}

/** Streaming embedding near-dup with PQ-coded state (ROADMAP item:
  * "streaming IVF-PQ"): the bucket state of [[StreamEmbedDedup]] holds
  * full 64-dim double vectors (512 B/key); this variant stores only the
  * 8-byte product-quantization code per member — a 64× state shrink
  * (32× vs float32 storage) that is what makes million-key streaming
  * dedup state fit RocksDB block cache at 100 TB corpus scale.
  *
  * PQ codes rank reliably but absolute-threshold poorly (reconstruction
  * error shifts cosines), so the operator follows q64's shortlist-then-
  * re-rank shape: per arrival it emits the top-R bucket-mates by
  * asymmetric distance (full incoming vector vs stored reconstruction —
  * ADC keeps one side exact) as CANDIDATES, and [[exactVerify]] confirms
  * them with true cosine via a stream-static join against the vector
  * table. Codebooks are the frozen literals of [[PqCodebook]] (same as
  * batch q64), hash family is the q32/q52 hyperplane family.
  */
object StreamEmbedDedupPq {

  import PqCodebook.{K, M, SubDim, books}
  import StreamEmbedDedup.{BucketedVec, Vec, buckets}

  case class CodedMember(vecId: Long, code: Array[Byte])
  case class Candidate(vecA: Long, vecB: Long, adc: Double)

  /** PQ-encode: per subspace, the first centroid index minimizing the
    * squared distance (same first-min tie-break as batch `Pq`). */
  def encode(v: Seq[Double]): Array[Byte] = {
    val code = new Array[Byte](M)
    var m = 0
    while (m < M) {
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < K) {
        var d = 0.0
        var i = 0
        while (i < SubDim) {
          val x = v(m * SubDim + i) - books(m)(k)(i); d += x * x; i += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      code(m) = best.toByte
      m += 1
    }
    code
  }

  /** x̂: concatenated chosen centroids. */
  def reconstruct(code: Array[Byte]): Array[Double] = {
    val out = new Array[Double](M * SubDim)
    var m = 0
    while (m < M) {
      System.arraycopy(books(m)(code(m) & 0xf), 0, out, m * SubDim, SubDim)
      m += 1
    }
    out
  }

  private def l2sq(a: Seq[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < b.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  class PqBucketProcessor(topR: Int)
    extends StatefulProcessor[String, BucketedVec, Candidate] {
    @transient private var members: ListState[CodedMember] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[CodedMember]("members",
        Encoders.product[CodedMember], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[BucketedVec],
                                 timerValues: TimerValues): Iterator[Candidate] = {
      val arrivals = rows.toSeq.sortBy(_.vecId)
      val out = Seq.newBuilder[Candidate]
      var seen = members.get().toVector
      val ids = scala.collection.mutable.HashSet.from(seen.iterator.map(_.vecId))
      arrivals.foreach { a =>
        if (ids.add(a.vecId)) {
          seen.iterator
            .map(m => (m.vecId, l2sq(a.v, reconstruct(m.code))))
            .toSeq.sortBy { case (id, d) => (d, id) }
            .take(topR)
            .foreach { case (id, d) =>
              out += Candidate(math.min(id, a.vecId), math.max(id, a.vecId), d)
            }
          val m = CodedMember(a.vecId, encode(a.v))
          members.appendValue(m)
          seen :+= m
        }
      }
      out.result().iterator
    }
  }

  /** Candidate near-dup pairs from PQ-coded bucket state (append-mode);
    * a pair surfacing in several tables is emitted once. */
  def candidates(vecs: Dataset[Vec], topR: Int = 4): Dataset[Candidate] = {
    import vecs.sparkSession.implicits._
    vecs.flatMap { r =>
        val v = r.embedding.map(_.toDouble)
        buckets(v).map(b => BucketedVec(b, r.vecId, v))
      }
      .groupByKey(_.bucket)
      .transformWithState(new PqBucketProcessor(topR),
        TimeMode.None(), OutputMode.Append())
      .dropDuplicates("vecA", "vecB")
  }

  /** Exact re-rank: confirm candidates with true cosine from the vector
    * table (stream-static equi-joins — broadcast-able dimension at
    * scale). `vectors` needs columns (vec_id, embedding array<float>). */
  def exactVerify(cands: DataFrame, vectors: DataFrame, threshold: Double): DataFrame = {
    val dv = transform(col("embedding"), x => x.cast("double"))
    val va = vectors.select(col("vec_id").as("vecA"), dv.as("ea"))
    val vb = vectors.select(col("vec_id").as("vecB"), dv.as("eb"))
    val cos = VectorOps.dot(col("ea"), col("eb")) /
      (sqrt(VectorOps.dot(col("ea"), col("ea"))) *
        sqrt(VectorOps.dot(col("eb"), col("eb"))))
    cands
      .join(va, "vecA").join(vb, "vecB")
      .withColumn("cosine", cos)
      .where(col("cosine") >= threshold)
      .select(col("vecA"), col("vecB"), col("cosine"))
  }
}
