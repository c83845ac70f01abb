package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.{ArtifactStore, SparkSpec}
import graft.streaming.{StreamIndexCompact, StreamMergeSink}

/** The cascade APPLIED (r7 verdict item 5): after one pass, flagged
  * docs vanish from the merge target's live view (as versioned
  * tombstones), from the compacted index's postings and lengths, and
  * the corpus-derived artifact family is invalidated on disk; a second
  * pass changes nothing (replay-idempotent).
  */
class TakedownApplySpec extends SparkSpec {
  import spark.implicits._

  test("one cascade pass clears live view, index, and edge artifact; second pass is a no-op") {
    val dir = Files.createTempDirectory("takedown").toString
    val mergeTarget = s"$dir/table"
    val indexTarget = s"$dir/index"

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // q144's flag rule: pmod(h60('takedown|' || id), 16) == 0
    val flagged = docs.select(col("doc_id"))
      .where(pmod(call_function("graft_h60",
        concat(lit("takedown|"), col("doc_id").cast("string"))), lit(16L)) === 0L)
      .as[Long].collect().toSeq
    assert(flagged.nonEmpty, "witness: the corpus must flag some docs")

    // build the deployment state: live table + compacted index
    StreamMergeSink.mergeBatch(mergeTarget, 8)(
      docs.select(col("doc_id").as("docId"), lit(1L).as("ver"),
        lit("I").as("op"), col("text")), 0L)
    StreamIndexCompact.compactBatch(indexTarget, 8)(docs, 0L)

    // a corpus-derived edge artifact (spec-scoped key, same mechanism
    // as minhash_pairs_v1)
    val specKey = s"spec_takedown_${System.nanoTime()}"
    ArtifactStore.documentsArtifact(spark, sfDir, specKey)(
      docs.select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b")))
    val fp = ArtifactStore.documentsFp(spark, sfDir)
    assert(Files.exists(Paths.get(ArtifactStore.root, specKey, s"fp-$fp")))

    def state() = (
      StreamMergeSink.liveView(spark, mergeTarget)
        .orderBy("docId").collect().toSeq,
      spark.read.parquet(mergeTarget).where("op = 'D'")
        .select("docId").as[Long].collect().toSet,
      StreamIndexCompact.postings(spark, indexTarget)
        .as[(Long, String, Long)].collect().toSet,
      StreamIndexCompact.doclens(spark, indexTarget)
        .as[(Long, Long)].collect().toSet)

    val (liveBefore, _, postBefore, lensBefore) = state()

    TakedownApply.cascade(spark, flagged,
      mergeTarget = Some(mergeTarget), mergeBuckets = 8,
      indexTarget = Some(indexTarget))
    TakedownApply.invalidateArtifacts(spark, sfDir, Seq(specKey))

    val (liveAfter, tombs, postAfter, lensAfter) = state()
    val fset = flagged.toSet
    // live view: flagged gone, unflagged untouched
    assert(liveAfter.map(_.getAs[Long]("docId")).toSet ==
      liveBefore.map(_.getAs[Long]("docId")).toSet -- fset)
    assert(tombs == fset, "every flagged doc must leave a tombstone")
    // index: flagged rows gone, everything else byte-identical
    assert(postAfter == postBefore.filterNot(r => fset(r._1)))
    assert(lensAfter == lensBefore.filterNot(r => fset(r._1)))
    // artifact: the corpus-derived family is gone from disk
    assert(!Files.exists(Paths.get(ArtifactStore.root, specKey, s"fp-$fp")),
      "the invalidated artifact must not survive the cascade")

    // idempotence: the second pass changes nothing
    val newlyTombstoned = TakedownApply.tombstoneMerged(
      spark, mergeTarget, 8, flagged)
    TakedownApply.scrubIndex(spark, indexTarget, flagged)
    assert(newlyTombstoned == 0L, "re-run must find nothing to tombstone")
    val (liveAgain, tombsAgain, postAgain, lensAgain) = state()
    assert(liveAgain == liveAfter && tombsAgain == tombs &&
      postAgain == postAfter && lensAgain == lensAfter,
      "the cascade must be replay-idempotent")
  }

  test("erasure beats time travel: no as-of boundary resurrects flagged content") {
    val dir = Files.createTempDirectory("takedown_tt").toString
    val mergeTarget = s"$dir/table"; val mergeLog = s"$dir/mlog"
    val indexTarget = s"$dir/index"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val flagged = docs.map(_._1).filter(_ % 5 == 0)
    assert(flagged.nonEmpty)

    // three logged batches of history for both the table and the index
    val (a, rest) = docs.splitAt(docs.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    Seq(a, b, c).zipWithIndex.foreach { case (batch, i) =>
      StreamMergeSink.mergeBatch(mergeTarget, 8, Some(mergeLog))(
        batch.toDF("doc_id", "text")
          .select(col("doc_id").as("docId"), lit(i + 1L).as("ver"),
            lit("I").as("op"), col("text")), i.toLong)
      StreamIndexCompact.compactBatch(indexTarget, 8)(
        batch.toDF("doc_id", "text"), i.toLong)
    }
    val keepBefore = (0L to 2L).map(bid =>
      TimeTravel.asOf(spark, mergeLog, bid)
        .where(!col("docId").isin(flagged: _*))
        .orderBy("docId").collect().toSeq)

    TakedownApply.cascade(spark, flagged,
      mergeTarget = Some(mergeTarget), mergeBuckets = 8,
      indexTarget = Some(indexTarget), mergeLog = Some(mergeLog))

    for (bid <- 0L to 2L) {
      // merge log: flagged docs read as deleted at EVERY boundary, and
      // their text exists nowhere in the raw log
      val asOf = TimeTravel.asOf(spark, mergeLog, bid)
      assert(asOf.where(col("docId").isin(flagged: _*)).count() == 0L,
        s"as-of $bid resurrected a flagged doc")
      assert(asOf.where(!col("docId").isin(flagged: _*))
        .orderBy("docId").collect().toSeq == keepBefore(bid.toInt),
        s"as-of $bid changed for unflagged docs")
      // index log: flagged docs absent from the historical index
      assert(StreamIndexCompact.asOfPostings(spark, indexTarget, bid)
        .where(col("doc_id").isin(flagged: _*)).count() == 0L,
        s"historical index at $bid still lists a flagged doc")
    }
    assert(spark.read.parquet(mergeLog)
      .where(col("docId").isin(flagged: _*) && col("text") =!= "")
      .count() == 0L, "flagged content survived in the raw merge log")

    // idempotent: a second pass leaves both logs byte-equal
    val rawBefore = spark.read.parquet(mergeLog).collect().map(_.toSeq).toSet
    TakedownApply.scrubMergeLog(spark, mergeLog, flagged)
    TakedownApply.scrubIndexLog(spark, indexTarget, flagged)
    assert(spark.read.parquet(mergeLog).collect().map(_.toSeq).toSet == rawBefore,
      "re-scrub mutated the merge log")
  }
}
