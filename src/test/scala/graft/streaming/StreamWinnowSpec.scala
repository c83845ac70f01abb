package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** The winnow fingerprint store's streaming maintainer: a document
  * stream split across micro-batches compacts to EXACTLY the batch
  * `winnow_fp_v1` artifact (selection is doc-local, so batch splits
  * cannot change it), the q188/q191 boards served off the live store
  * equal the batch queries row for row at a quiesced boundary, replay
  * is a no-op, and the takedown leg erases and stays erased under
  * replay of a covered batch.
  */
class StreamWinnowSpec extends SparkSpec {
  import spark.implicits._

  private type Doc = (Long, String)

  private lazy val docs: Seq[Doc] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq

  private def selSet(target: String): Set[(Long, Long)] =
    StreamWinnow.selection(spark, target)
      .as[(Long, Long)].collect().toSet

  test("stream-compacted selection == batch artifact; boards == batch " +
    "q188/q191; replay is a no-op; scrub erases through replay") {
    val dir = Files.createTempDirectory("winnow_stream").toString
    val target = s"$dir/winnow_target"
    val splits = {
      val (a, rest) = docs.splitAt(docs.size / 3)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c)
    }
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Doc]
      val q = StreamWinnow.start(
        stream.toDF().toDF("doc_id", "text"),
        target, s"$dir/ckpt", buckets = 4)
      try splits.foreach { bt => stream.addData(bt); q.processAllAvailable() }
      finally q.stop()
    }

    // 1. the live store equals the batch artifact row for row
    val batchSel = graft.queries.AnalyticsQueries
      .winnowFpArtifact(spark, sfDir)
      .select("doc_id", "wmin").as[(Long, Long)].collect().toSet
    assert(batchSel.nonEmpty, "witness: the corpus must select fingerprints")
    assert(selSet(target) == batchSel,
      "stream-built selection must equal the batch artifact row-for-row")

    // 2. one scorer, two feeds: the boards equal batch q188/q191
    val liveFp = StreamWinnow.fingerprintBoard(spark, target)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    val batchFp = graft.SparkEntry
      .queries("q188_winnow_fingerprint")(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(liveFp == batchFp,
      "the live fingerprint board must equal batch q188 row-for-row")
    val liveM = StreamWinnow.matchesBoard(spark, target)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    val batchM = graft.SparkEntry
      .queries("q191_winnow_matches")(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(liveM == batchM,
      "the live match board must equal batch q191 row-for-row")
    assert(liveM.nonEmpty, "witness: the corpus's near-dups must pair")

    // 3. replaying an already-compacted batch rewrites identical rows
    val before = selSet(target)
    StreamWinnow.compactBatch(target, 4)(
      splits.head.toDF("doc_id", "text"), 0L)
    assert(selSet(target) == before, "replay must be a no-op")

    // 4. takedown: a flagged doc's rows leave both stores, and a
    // checkpoint replay of a batch the scrub already covered cannot
    // resurrect them (the registry gate)
    val victim = liveM.head._1
    StreamWinnow.scrub(spark, target, Seq(victim))
    assert(!selSet(target).exists(_._1 == victim),
      "scrubbed doc must have no fingerprints")
    assert(StreamWinnow.grams(spark, target)
      .where(org.apache.spark.sql.functions.col("doc_id") === victim)
      .isEmpty, "scrubbed doc must have no lens row")
    StreamWinnow.compactBatch(target, 4)(
      splits.head.toDF("doc_id", "text"), 0L) // covered-batch replay
    assert(!selSet(target).exists(_._1 == victim),
      "replay of a covered batch must not resurrect the victim")
    // a post-takedown RE-ADD (new batch id above the erasure window)
    // indexes normally — erasure is retroactive, never prospective
    StreamWinnow.compactBatch(target, 4)(
      splits.flatten.filter(_._1 == victim).toDF("doc_id", "text"), 99L)
    assert(selSet(target).exists(_._1 == victim),
      "a genuinely new batch must re-index the re-added doc")

    // 5. janitor: an upstream-removed doc is evicted from both stores,
    // a doc still live survives untouched, and a second pass is a
    // byte-level no-op (idempotence)
    val evictee = selSet(target).map(_._1).max
    val live = docs.filter(_._1 != evictee).toDF("doc_id", "text")
    StreamWinnow.janitor(spark, target, live)
    assert(!selSet(target).exists(_._1 == evictee),
      "janitor must evict the upstream-removed doc")
    assert(StreamWinnow.grams(spark, target)
      .where(org.apache.spark.sql.functions.col("doc_id") === evictee)
      .isEmpty, "janitor must evict the lens row too")
    def storeBytes: Long = {
      val root = java.nio.file.Paths.get(target)
      val kids = java.nio.file.Files.walk(root)
      try kids.toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.toString.endsWith(".parquet"))
        .map(java.nio.file.Files.size).sum
      finally kids.close()
    }
    val before2 = (selSet(target), storeBytes)
    StreamWinnow.janitor(spark, target, live)
    assert((selSet(target), storeBytes) == before2,
      "a second janitor pass must touch nothing")

    // 6. a doc SHORTER than k+w−1 tokens has a lens row but zero
    // fingerprints — eviction must key on the union of both stores,
    // or the removed doc's lens row (and its q188 board row) would
    // survive every janitor pass
    val shortId = 999999L
    StreamWinnow.compactBatch(target, 4)(
      Seq((shortId, "a b c d e")).toDF("doc_id", "text"), 100L)
    def lensHas(id: Long): Boolean = !StreamWinnow.grams(spark, target)
      .where(org.apache.spark.sql.functions.col("doc_id") === id).isEmpty
    assert(lensHas(shortId) && !selSet(target).exists(_._1 == shortId),
      "witness: the short doc must be lens-only")
    StreamWinnow.janitor(spark, target, live) // live excludes shortId
    assert(!lensHas(shortId),
      "janitor must evict a lens-only (fingerprint-less) doc")
  }
}
