package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Stream-maintained ANN code index == batch-built artifact: the rows
  * agree, q164's serve tail answers identically from both, and a
  * replayed batch is a no-op rewrite.
  */
class StreamAnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private type Vec = (Long, Seq[Float])

  private lazy val vectors: Seq[Vec] =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").as[Vec].collect().toSeq

  private def codesMap(df: org.apache.spark.sql.DataFrame)
    : Map[Long, (Long, Seq[Long])] =
    df.select("vec_id", "cell", "codes").as[(Long, Long, Seq[Long])]
      .collect().map { case (id, c, cs) => id -> ((c, cs)) }.toMap

  test("stream-built codes == batch artifact; q164 serves identically; " +
      "replay is a no-op") {
    val coarse = graft.llm.ServeBooks.coarse(spark, sfDir)
    val resBooks = graft.llm.ServeBooks.pqRes(spark, sfDir)
    val dir = Files.createTempDirectory("ann_index").toString
    val target = s"$dir/codes"
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Vec]
    val q = StreamAnnIndex.start(
      stream.toDF().toDF("vec_id", "embedding"),
      target, s"$dir/ckpt", coarse, resBooks, 4)
    try {
      val (a, rest) = vectors.splitAt(vectors.size / 3)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c).foreach { batch =>
        stream.addData(batch); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = codesMap(StreamAnnIndex.codes(spark, target))
    val batch = codesMap(graft.llm.ServeBooks.pqResCodes(spark, sfDir))
    assert(streamed == batch,
      "stream-maintained codes differ from the batch artifact")

    // the serve tail answers bit-identically from either index
    val fromStream = graft.queries.SimilarityQueries
      .knnIvfPqResOver(spark, sfDir, StreamAnnIndex.codes(spark, target))
      .collect().map(_.toSeq).toSeq
    val fromBatch = graft.queries.SimilarityQueries
      .knnIvfPqRes(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(fromStream == fromBatch,
      "q164 answers differ between stream and batch indexes")

    // replay: re-merging a batch of already-indexed vectors changes nothing
    StreamAnnIndex.compactBatch(target, coarse, resBooks, 4)(
      vectors.take(5).toDF("vec_id", "embedding"), 99L)
    assert(codesMap(StreamAnnIndex.codes(spark, target)) == batch,
      "replaying indexed vectors mutated the target")

    // vector takedown: scrub flagged ids (incl. every vector of bucket
    // 3 mod 4 — the all-flagged-bucket case), serve excludes them, and
    // serving equals the batch codes minus the same ids
    val flagged = vectors.map(_._1).filter(id => id % 4 == 3) ++ Seq(0L)
    StreamAnnIndex.scrub(spark, target, flagged)
    val scrubbed = codesMap(StreamAnnIndex.codes(spark, target))
    assert(scrubbed == batch.removedAll(flagged),
      "scrub must drop exactly the flagged vectors")
    val servedAfter = graft.queries.SimilarityQueries
      .knnIvfPqResOver(spark, sfDir, StreamAnnIndex.codes(spark, target))
      .collect().map(_.toSeq).toSeq
    val expectAfter = graft.queries.SimilarityQueries
      .knnIvfPqResOver(spark, sfDir,
        graft.llm.ServeBooks.pqResCodes(spark, sfDir)
          .where(!org.apache.spark.sql.functions.col("vec_id")
            .isin(flagged: _*)))
      .collect().map(_.toSeq).toSeq
    assert(servedAfter == expectAfter,
      "post-scrub serving differs from the flag-filtered batch index")
    assert(!servedAfter.exists(r => flagged.contains(r(1))),
      "a flagged vector survived into the served top-K")
    // idempotent: a second pass rewrites nothing
    StreamAnnIndex.scrub(spark, target, flagged)
    assert(codesMap(StreamAnnIndex.codes(spark, target)) == scrubbed,
      "re-scrub mutated the target")

    // erasure survives REPLAY (r13 self-review finding 4): a checkpoint
    // replay of a pre-scrub batch re-encodes the victims, and without
    // the registry gate the per-key max() merge would re-insert their
    // codes with nothing left to re-scrub them
    val (ra, _) = vectors.splitAt(vectors.size / 3)
    StreamAnnIndex.compactBatch(target, coarse, resBooks, 4)(
      ra.toDF("vec_id", "embedding"), 0L)
    assert(codesMap(StreamAnnIndex.codes(spark, target)) == scrubbed,
      "replay after takedown must not resurrect erased codes")

    // ...but erasure is retroactive, never prospective: a NEW batch
    // (id above the scrub's recorded window) re-adds normally
    val readd = vectors.find(v => flagged.contains(v._1)).get
    StreamAnnIndex.compactBatch(target, coarse, resBooks, 4)(
      Seq(readd).toDF("vec_id", "embedding"), 100L)
    assert(codesMap(StreamAnnIndex.codes(spark, target))
      .contains(readd._1),
      "a post-takedown re-add (new batch id) must index normally")
  }
}
