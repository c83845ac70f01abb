package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Streaming centroid update (batch q102's cross-batch twin): the
  * claims that matter are (1) batch-split invariance — replaying the
  * same vectors in one batch or three produces the SAME final
  * snapshot, because the state is an exact integer monoid, and (2)
  * parity — that snapshot equals batch q102's rows bit-for-bit
  * (same cells, counts, and IEEE-double means), so the stream is a
  * drop-in live view of the batch job.
  */
class StreamCentroidSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs: Seq[(Long, Seq[Float])] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq.sortBy(_._1)

  /** latest emitted row per (cell, dim) = the one with max nMembers
    * (per-cell counts only grow). */
  private def finalSnapshot(rows: Seq[(Long, Long, Long, Double)])
    : Map[(Long, Long), (Long, Double)] = {
    val maxN = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    rows.filter { case (cell, n, _, _) => n == maxN(cell) }
      .map { case (cell, n, dim, mean) => (cell, dim) -> ((n, mean)) }.toMap
  }

  private def run(batches: Seq[Seq[(Long, Seq[Float])]], name: String)
    : Map[(Long, Long), (Long, Double)] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    // stream-start state = the pinned curation snapshot (the book a
    // deployment freezes when the stream launches)
    val query = StreamCentroid(stream.toDF()
        .toDF("vec_id", "embedding"),
        graft.llm.CurationSnapshot.centroids(spark, sfDir))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      finalSnapshot(spark.table(name)
        .as[(Long, Long, Long, Double)].collect().toSeq)
    } finally query.stop()
  }

  test("batch-split invariance and bit-exact parity with batch q102") {
    val oneBatch = run(Seq(vecs), "sc_one")
    val (a, rest) = vecs.splitAt(vecs.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    val threeBatches = run(Seq(a, b, c), "sc_three")
    assert(oneBatch == threeBatches,
      "snapshot depends on batch boundaries — state is not a monoid")

    val batch = graft.SparkEntry.queries("q102_centroid_update")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> ((r.getLong(1), r.getDouble(3))))
      .toMap
    assert(oneBatch.keySet == batch.keySet, "cell/dim coverage differs")
    oneBatch.foreach { case (k, (n, mean)) =>
      assert(batch(k)._1 == n, s"$k count: stream $n vs batch ${batch(k)._1}")
      assert(java.lang.Double.compare(batch(k)._2, mean) == 0,
        s"$k mean: stream $mean vs batch ${batch(k)._2}")
    }
  }

  test("assignment twin: every sf0.001 vector lands in q102's cell") {
    val batchCells = graft.SparkEntry.queries("q101_semdedup_prune")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cents = graft.llm.CurationSnapshot.centroids(spark, sfDir)
    val nrm2 = StreamCentroid.nrm2Of(cents)
    vecs.foreach { case (id, emb) =>
      val v = emb.map(_.toDouble).toArray
      assert(StreamCentroid.assign(cents, nrm2, v).toLong == batchCells(id),
        s"vec $id assigned differently")
    }
  }
}
