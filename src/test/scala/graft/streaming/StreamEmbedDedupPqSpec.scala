package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.StreamEmbedDedup.Vec

/** PQ-coded streaming near-dup: candidates from 8-byte-code state plus
  * exact re-rank must find the same planted near-dup the full-vector
  * variant finds, end-to-end across batch boundaries. */
class StreamEmbedDedupPqSpec extends SparkSpec {
  import spark.implicits._

  test("PQ candidate + exact verify catches a cross-batch near-copy of a real embedding") {
    withRocksDb {
      // real sf0.001 embeddings (the distribution the PQ codebook was
      // trained on) + a perturbed near-copy of vec 0 under a fresh id
      val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding").orderBy("vec_id").limit(30)
        .as[(Long, Seq[Float])].collect()
      val (copyOfId, base) = (rows.head._1, rows.head._2)
      val nearCopy = base.zipWithIndex.map { case (x, i) =>
        if (i == 0) x + 0.002f else x
      }
      val copyId = 999999L
      val static = (rows :+ (copyId, nearCopy)).toSeq
        .toDF("vec_id", "embedding")

      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Vec]
      val cands = StreamEmbedDedupPq.candidates(stream.toDS(), topR = 4)
      val verified = StreamEmbedDedupPq.exactVerify(
        cands.toDF(), static, threshold = 0.99)
      val query = verified.writeStream.format("memory")
        .queryName("embed_dedup_pq").outputMode("append").start()
      try {
        val (first, rest) = rows.splitAt(10)
        stream.addData(first.map { case (id, e) => Vec(id, e) }.toSeq)
        query.processAllAvailable()
        stream.addData(rest.map { case (id, e) => Vec(id, e) }.toSeq)
        query.processAllAvailable()
        stream.addData(Vec(copyId, nearCopy)) // two batches after its original
        query.processAllAvailable()
        val pairs = spark.table("embed_dedup_pq")
          .select("vecA", "vecB").as[(Long, Long)].collect().toSet
        assert(pairs.contains((copyOfId, copyId)),
          s"planted near-dup ($copyOfId,$copyId) not found; saw $pairs")
        // precision: every emitted pair must be a TRUE >= 0.99 pair
        // (driver-side all-pairs ground truth over the 31 fixture vectors)
        val all = (rows :+ (copyId, nearCopy)).map { case (id, e) =>
          id -> e.map(_.toDouble)
        }
        val truePairs = (for {
          (ia, va) <- all; (ib, vb) <- all if ia < ib
          if StreamEmbedDedup.cosine(va, vb) >= 0.99
        } yield (ia, ib)).toSet
        assert(pairs.subsetOf(truePairs),
          s"false positives: ${pairs.diff(truePairs)}")
      } finally query.stop()
    }
  }

  test("encode/reconstruct round-trip is deterministic and code is 8 bytes") {
    val v = (0 until graft.llm.VectorOps.Dim).map(i => math.sin(i * 0.37) * 0.1)
    val c1 = StreamEmbedDedupPq.encode(v)
    val c2 = StreamEmbedDedupPq.encode(v)
    assert(c1.toSeq == c2.toSeq && c1.length == graft.llm.PqCodebook.M)
    val xhat = StreamEmbedDedupPq.reconstruct(c1)
    assert(xhat.length == graft.llm.VectorOps.Dim)
    // reconstruction of a reconstruction is a fixpoint (centroids map to themselves)
    assert(StreamEmbedDedupPq.encode(xhat.toSeq).toSeq == c1.toSeq)
  }
}
