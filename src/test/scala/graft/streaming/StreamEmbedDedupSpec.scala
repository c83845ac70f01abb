package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.streaming.StreamEmbedDedup.{NearDup, Vec}

/** Streaming embedding near-dup: a lightly-perturbed copy arriving
  * batches after its original is caught via bucket-state cosine checks;
  * dissimilar vectors never pair. */
class StreamEmbedDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = graft.llm.VectorOps.Dim
  // deterministic "embedding": unit-ish vector concentrated on a band
  private def vec(center: Int): Seq[Float] =
    (0 until dim).map(i => if (math.abs(i - center) <= 3) 1.0f else 0.01f)
  private def perturbed(center: Int): Seq[Float] =
    (0 until dim).map(i =>
      (if (math.abs(i - center) <= 3) 1.0f else 0.01f) + (if (i == 0) 0.02f else 0f))

  test("high-cosine pair across batches is caught; dissimilar vectors are not") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Vec]
      val query = StreamEmbedDedup.nearDups(stream.toDS(), threshold = 0.95)
        .writeStream.format("memory").queryName("embed_dedup")
        .outputMode("append").start()
      try {
        stream.addData(Vec(1, vec(10)))
        query.processAllAvailable()
        stream.addData(Vec(2, vec(40))) // different band: low cosine
        query.processAllAvailable()
        stream.addData(Vec(3, perturbed(10))) // near-copy of 1, 2 batches later
        query.processAllAvailable()
        val pairs = spark.table("embed_dedup").as[NearDup].collect()
        assert(pairs.map(p => (p.vecA, p.vecB)).toSet == Set((1L, 3L)),
          s"expected exactly the (1,3) near-dup, saw ${pairs.mkString(", ")}")
        assert(pairs.head.cosine >= 0.95)
      } finally query.stop()
    }
  }

  test("bucket hashing matches the batch hyperplane family's shape") {
    val b = StreamEmbedDedup.buckets(vec(10).map(_.toDouble))
    assert(b.length == 4 && b.forall(_.contains("|")))
    // identical vector → identical buckets
    assert(b == StreamEmbedDedup.buckets(vec(10).map(_.toDouble)))
  }
}
