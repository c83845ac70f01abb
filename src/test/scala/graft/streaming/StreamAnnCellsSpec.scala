package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.llm.{ServeBooks, VectorOps}

/** The ingest stream grows the SAME artifact the serve stream pins:
  * streamed vectors land in their frozen-book cells byte-identically
  * to a batch assignment, replay is a no-op, serving over the grown
  * corpus equals the batch pipeline over the same vectors, and a
  * takedown scrubs a streamed vector out of the grown files.
  */
class StreamAnnCellsSpec extends SparkSpec {
  import spark.implicits._

  private val SplitId = 400L

  test("streamed vectors join the pinned artifact; serve sees them; " +
    "replay no-op; takedown reaches streamed rows") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("ann_cells_stream").toString
    // base corpus: the first 400 vectors, as a corpus dir of its own —
    // PERTURBED so this corpus's vectors are byte-distinct from the
    // main corpus's under the same ids: the takedown's cross-corpus
    // assertion below is about a colliding id carrying a DIFFERENT
    // vector (erasure matches (vec_id, digest) pairs — identical bytes
    // under the same id would rightly be erased everywhere). Salted
    // PER RUN (ArtifactDeltaSpec's discipline): the artifact store is
    // persistent and fp-keyed, so a deterministic perturbation would
    // find a failed prior run's tombstones/generations already
    // published under the same fingerprint.
    val salt = ((new scala.util.Random).nextInt(4000) + 1000) / 1000.0f
    val full = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("embedding",
        transform(col("embedding"), x => (x + lit(salt)).cast("float")))
    full.where(col("vec_id") < SplitId)
      .write.parquet(s"$tmp/embeddings.parquet")

    // freeze the base generation (book trained on the base corpus)
    val book = ServeBooks.coarse(spark, tmp)
    val fp = ServeBooks.annCellsFp(spark, tmp)
    val dataPath = ServeBooks.annCellsPath(spark, tmp)
    // cleanup even on mid-test failure (reset drops this corpus's
    // generations + tombstones): a leaked generation shares the main
    // corpus's vec_id space and would trip StreamAnnServeSpec's
    // no-generation-holds-the-victim sweep
    try {

    // stream the held-out 100 vectors in two out-of-order batches
    val holdout = full.where(col("vec_id") >= SplitId)
      .select(col("vec_id"), col("embedding").cast("array<float>"))
      .as[(Long, Seq[Float])].collect().toSeq
    val stream = MemoryStream[(Long, Seq[Float])]
    val q = StreamAnnCells.start(
      stream.toDS().toDF("vec_id", "embedding"), tmp, s"$tmp/ckpt")
    try {
      val (odd, even) = holdout.partition(_._1 % 2 == 1)
      stream.addData(odd); q.processAllAvailable()
      stream.addData(even); q.processAllAvailable()
    } finally q.stop()

    // expected: ALL 500 vectors assigned with the frozen base book
    def expectedCells: DataFrame = full
      .select(col("vec_id"), VectorOps.toDoubleArr(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
      .withColumn("cell", ServeBooks.cell(book, col("v")))
    def rowSet(df: DataFrame) = df
      .select(col("vec_id"), col("cell").cast("long"), col("nrm"), col("v"))
      .collect().map { r =>
        (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)),
          r.getSeq[Double](3))
      }.toSet
    val stored = spark.read.parquet(dataPath)
    assert(rowSet(stored) == rowSet(expectedCells),
      "grown artifact must equal the batch assignment of the grown corpus")

    // replay an already-merged batch: byte-identical rows, no growth
    val before = rowSet(spark.read.parquet(dataPath))
    StreamAnnCells.compactBatch(dataPath, book, fp,
      graft.ArtifactStore.embeddingsFp(spark, tmp), tmp)(
      holdout.filter(_._1 % 2 == 1).toDF("vec_id", "embedding"), 99L)
    assert(rowSet(spark.read.parquet(dataPath)) == before,
      "replay must be a no-op")

    // the serve path answers over the grown corpus: streamed vectors
    // are retrievable through the pruned candidate read
    val queries = full.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        VectorOps.toDoubleArr(col("embedding")).as("qv"))
    val probed = StreamAnnServe.probedCells(book, queries)
    val served = StreamAnnServe.answerBatch(
      StreamAnnServe.candidates(spark, dataPath, probed), book)(queries)
    val expectedAnswers = StreamAnnServe.answerBatch(expectedCells, book)(queries)
    def ansSet(df: DataFrame) = df.collect().map { r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("rn"),
        r.getAs[Long]("neighbor_id"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("cos")))
    }.toSet
    assert(ansSet(served) == ansSet(expectedAnswers),
      "serving from the grown artifact must equal the batch pipeline")
    assert(served.where(col("neighbor_id") >= SplitId).count() > 0L ||
      expectedAnswers.where(col("neighbor_id") >= SplitId).count() == 0L,
      "witness: streamed vectors must be servable when they rank")

    // takedown reaches a STREAMED row in the grown generation — and
    // ONLY in this corpus's generations: the same numeric vec_id in
    // another corpus is a different vector (different carry digest —
    // this spec's corpus is perturbed above) and must survive
    val mainPath = ServeBooks.annCellsPath(spark, sfDir)
    val victim = holdout.head._1
    assert(spark.read.parquet(mainPath)
      .where(col("vec_id") === victim).count() == 1L,
      "witness: the main corpus generation holds the same numeric id")
    assert(graft.sources.VecTakedown.flag(spark, tmp, Seq(victim)) == 1L)
    assert(spark.read.parquet(dataPath)
      .where(col("vec_id") === victim).count() == 0L,
      "the scrub must remove the streamed vector's row in place")
    assert(spark.read.parquet(mainPath)
      .where(col("vec_id") === victim).count() == 1L,
      "a takedown for one corpus must not touch another corpus's rows")

    // erasure survives REPLAY (r11 ADVICE): a checkpoint replay of an
    // in-flight batch after the flag — or redelivery of the taken-down
    // vector itself — must not re-insert the erased vector's raw bytes
    // into the published generation (the flag-time scrub already ran
    // and nothing would ever re-scrub them); the merge's per-batch
    // tombstone anti-join is what enforces it
    val preReplay = rowSet(spark.read.parquet(dataPath))
    StreamAnnCells.compactBatch(dataPath, book, fp,
      graft.ArtifactStore.embeddingsFp(spark, tmp), tmp)(
      holdout.toDF("vec_id", "embedding"), 100L)
    assert(spark.read.parquet(dataPath)
      .where(col("vec_id") === victim).count() == 0L,
      "replay after takedown must not resurrect the erased vector")
    assert(rowSet(spark.read.parquet(dataPath)) == preReplay,
      "the post-takedown replay must be a no-op for surviving rows too")
    } finally graft.sources.VecTakedown.reset(spark, tmp)
  }
}
