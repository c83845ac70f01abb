package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming Count-Min sketch (batch q166's cross-batch twin): the
  * monoid state is batch-boundary-invariant and the final snapshot
  * equals the batch grid over the same documents bit-for-bit — the
  * live sketch serves the same estimates the nightly build would.
  */
class StreamCmsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val texts: Seq[String] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").as[String].collect().toSeq

  private lazy val batchGrid: Map[(Long, Long), Long] =
    graft.queries.TextStatsQueries.cmsSketch(spark, sfDir)
      .as[(Long, Long, Long)].collect()
      .map { case (j, b, c) => (j, b) -> c }.toMap

  /** latest snapshot per cell = its max cnt (counts only grow). */
  private def run(batches: Seq[Seq[String]], name: String)
    : Map[(Long, Long), Long] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val query = StreamCms(stream.toDF().toDF("text"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      spark.table(name).as[(Long, Long, Long)].collect()
        .groupBy(r => (r._1, r._2)).view
        .mapValues(_.map(_._3).max).toMap
    } finally query.stop()
  }

  test("split invariance; final snapshot equals the batch q166 grid") {
    val one = run(Seq(texts), "cms_one")
    val (a, rest) = texts.splitAt(texts.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    val three = run(Seq(a, b, c), "cms_three")
    assert(one == three, "sketch state depends on batch boundaries")
    assert(one == batchGrid,
      "live sketch differs from the batch q166 grid")
  }

  test("checkpointed restart resumes the sketch state (RocksDB provider)") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val dir = java.nio.file.Files.createTempDirectory("cms_restart").toString
      val stream = MemoryStream[String]
      val out = s"$dir/out"
      def start() =
        StreamCms(stream.toDF().toDF("text")).writeStream
          .format("parquet").option("path", out)
          .option("checkpointLocation", s"$dir/ckpt")
          .outputMode("append").start()
      val (a, b) = texts.splitAt(texts.size / 2)
      val q1 = start()
      try { stream.addData(a); q1.processAllAvailable() } finally q1.stop()
      // restart from the checkpoint; the second half's emissions must
      // INCLUDE the first half's restored counts — taking the max per
      // cell across all emissions then equals the whole-corpus batch
      // grid iff state survived the restart
      val q2 = start()
      try { stream.addData(b); q2.processAllAvailable() } finally q2.stop()
      val merged = spark.read.parquet(out)
        .selectExpr("j", "bucket", "cnt").as[(Long, Long, Long)].collect()
        .groupBy(r => (r._1, r._2)).view
        .mapValues(_.map(_._3).max).toMap
      assert(merged == batchGrid,
        "restart lost or double-counted sketch state")
    }
  }
}
