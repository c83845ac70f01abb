package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The streaming verdict-flags maintainer equals the batch flag build
  * over the same corpus — out-of-order arrival, canonical reassignment
  * by a late-arriving smaller doc_id, a doc arriving as a later
  * duplicate of an earlier canonical, checkpoint-style replay, and the
  * takedown scrub all included.
  */
class StreamVerdictFlagsSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDocs: DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))

  private def rows(df: DataFrame): Set[Row] = df.collect().toSet

  /** Batch oracle: the artifact build's exact plan over `docs`. */
  private def batchFlags(docs: DataFrame): DataFrame =
    graft.queries.TextStatsQueries.verdictFlagsOver(docs)

  test("stream-maintained flags == batch build; late smaller id " +
    "demotes an earlier canonical; later dup of an earlier canonical " +
    "is not canonical; replay is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("verdict_stream").toString
    val target = s"$dir/flags_target"

    // synthetic dup pair around an existing doc's text, exercising both
    // directions of out-of-order canonicality:
    //  - big(+100000) carries doc 0's text and arrives FIRST (batch 1):
    //    it is briefly canonical until doc 0 arrives (batch 2) with the
    //    smaller id — late arrival DEMOTES it;
    //  - late(+100001) carries doc 1's text and arrives LAST (batch 2),
    //    after doc 1 (batch 1) — a later duplicate of an earlier
    //    canonical, never canonical itself.
    val base = corpusDocs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val t0 = base.find(_._1 == 0L).get
    val t1 = base.find(_._1 == 1L).get
    val big = (100000L, t0._2, t0._3, t0._4)
    val late = (100001L, t1._2, t1._3, t1._4)
    val all = base.toSeq :+ big :+ late
    val (batch2base, batch1base) = base.toSeq.partition(_._1 % 2 == 0)
    val batch1 = batch1base :+ big   // doc 1 in batch 1; doc 0 in batch 2
    val batch2 = batch2base :+ late

    val stream = MemoryStream[(Long, String, String, String)]
    val query = StreamVerdictFlags.start(
      stream.toDS().toDF("doc_id", "lang", "source", "text"),
      target, s"$dir/ckpt")
    try {
      stream.addData(batch1); query.processAllAvailable()
      // mid-stream: the big id IS canonical for t0's text so far
      val mid = StreamVerdictFlags.flagsFromStore(spark, target)
        .where(col("doc_id") === big._1).select("is_canonical")
        .as[Boolean].head()
      assert(mid, "witness: the early-arriving dup is canonical until " +
        "the smaller id arrives")
      stream.addData(batch2); query.processAllAvailable()
    } finally query.stop()

    val expected = batchFlags(all.toDF("doc_id", "lang", "source", "text"))
    val served = StreamVerdictFlags.flagsFromStore(spark, target)
    assert(rows(served) == rows(expected),
      "stream-maintained flags must equal the batch build row-for-row")
    // the dashboard serves q75's verdict and q140's funnel live from
    // the stores, through the same shared tails the batch queries run
    assert(rows(StreamVerdictFlags.verdictFromStore(spark, target)) ==
      rows(graft.queries.TextStatsQueries.verdictOver(expected)),
      "verdict from the store must equal the batch verdict tail")
    assert(rows(StreamVerdictFlags.funnelFromStore(spark, target)) ==
      rows(graft.queries.TextStatsQueries.funnelOver(expected)),
      "funnel from the store must equal the batch funnel tail")
    // the named cases, explicitly
    val canonOf = served.select(col("doc_id"), col("is_canonical"))
      .as[(Long, Boolean)].collect().toMap
    assert(!canonOf(big._1), "the demoted early dup must not stay canonical")
    assert(canonOf(0L), "the late-arriving smaller id must take the slot")
    assert(!canonOf(late._1), "a later dup of an earlier canonical " +
      "must not be canonical")
    assert(canonOf(1L), "the earlier canonical keeps its slot")

    // replay: re-merging an already-merged batch changes nothing
    StreamVerdictFlags.compactBatch(target, 16)(
      batch1.toDF("doc_id", "lang", "source", "text"), 99L)
    assert(rows(StreamVerdictFlags.flagsFromStore(spark, target)) ==
      rows(expected), "replaying a merged batch must be a no-op")

    // takedown: erase doc 1 (an earlier canonical with a live dup) —
    // the slot must fall to the surviving dup, rows must vanish, and
    // the result must equal a batch build over the post-takedown corpus
    StreamVerdictFlags.scrub(spark, target, Seq(1L))
    val postCorpus = all.filterNot(_._1 == 1L)
    assert(rows(StreamVerdictFlags.flagsFromStore(spark, target)) ==
      rows(batchFlags(postCorpus.toDF("doc_id", "lang", "source", "text"))),
      "post-scrub flags must equal the batch build minus the victim")
    assert(StreamVerdictFlags.flagsFromStore(spark, target)
      .where(col("doc_id") === late._1).select("is_canonical")
      .as[Boolean].head(),
      "the erased canonical's slot must fall to the surviving dup")
    // the members sidecar (the scrub leg's locality index — scrub
    // names every touched bucket driver-side instead of scanning the
    // flags store for survivors) erased the victim's row too
    assert(spark.read.parquet(s"$target/members")
      .where(col("doc_id") === 1L).count() == 0L,
      "scrubbed doc still has a members row")
    // idempotent second pass
    StreamVerdictFlags.scrub(spark, target, Seq(1L))
    assert(rows(StreamVerdictFlags.flagsFromStore(spark, target)) ==
      rows(batchFlags(postCorpus.toDF("doc_id", "lang", "source", "text"))),
      "a second scrub pass must change nothing")

    // erasure survives REPLAY (r13 self-review finding 4): replaying
    // the pre-scrub batches must neither resurrect the victim's rows
    // nor steal back the reassigned canonical slot
    StreamVerdictFlags.compactBatch(target, 16)(
      batch1.toDF("doc_id", "lang", "source", "text"), 0L)
    StreamVerdictFlags.compactBatch(target, 16)(
      batch2.toDF("doc_id", "lang", "source", "text"), 1L)
    assert(rows(StreamVerdictFlags.flagsFromStore(spark, target)) ==
      rows(batchFlags(postCorpus.toDF("doc_id", "lang", "source", "text"))),
      "replay after takedown must not resurrect the erased doc")

    // retroactive, never prospective: a NEW batch re-adding the same
    // doc id indexes normally — the corpus semantics return to the
    // full build, canonical slot included
    val doc1 = all.find(_._1 == 1L).get
    StreamVerdictFlags.compactBatch(target, 16)(
      Seq(doc1).toDF("doc_id", "lang", "source", "text"), 100L)
    assert(rows(StreamVerdictFlags.flagsFromStore(spark, target)) ==
      rows(batchFlags(all.toDF("doc_id", "lang", "source", "text"))),
      "a post-takedown re-add (new batch id) must restore the full " +
        "corpus semantics")
  }

  test("q75/q140 unchanged: the artifact build equals verdictFlagsOver " +
    "of the corpus") {
    // the refactor that exposed the row-local fragment must leave the
    // batch artifact's rows exactly as r10 published them
    val art = graft.SparkEntry.queries("q75_curation_verdict")(spark, sfDir)
    val rebuilt = batchFlags(corpusDocs)
      .select(col("doc_id"), col("is_canonical"), col("lang_ok"),
        col("quality_ok"), col("rep_keep"), col("sample_keep"),
        (col("is_canonical") && col("lang_ok") && col("quality_ok") &&
          col("rep_keep") && col("sample_keep")).as("verdict"))
    assert(rows(art) == rows(rebuilt),
      "q75 must equal the refactored flag plan over the corpus")
  }

  test("_buckets contract: scrub honors the stored count over the " +
      "caller's; a mismatched restart fails loud") {
    val dir = Files.createTempDirectory("verdict_meta").toString
    val target = s"$dir/t"
    // victim doc_id 6: floorMod(6, 4) = 2 but floorMod(6, 16) = 6, so
    // a scrub trusting the caller's default count would name a bucket
    // that does not even exist and the victim would silently survive —
    // the exact failure mode the stored meta prevents
    val docs = Seq(
      (5L, "en", "web", "the quick brown fox jumps over the lazy dog"),
      (6L, "en", "web", "the quick brown fox jumps over the lazy dog"),
      (7L, "en", "web", "an entirely different text about something else"))
    // NON-default bucket count: the stores partition pmod(key, 4)
    StreamVerdictFlags.compactBatch(target, 4)(
      docs.toDF("doc_id", "lang", "source", "text"), 0L)
    // a restart with a different count must fail loud, not mix moduli
    val e = intercept[IllegalArgumentException](
      StreamVerdictFlags.compactBatch(target, 16)(
        docs.toDF("doc_id", "lang", "source", "text"), 1L))
    assert(e.getMessage.contains("4"), e.getMessage)
    // scrub called with the (wrong) DEFAULT buckets=16: the stored
    // meta must win
    StreamVerdictFlags.scrub(spark, target, Seq(6L))
    assert(spark.read.parquet(s"$target/flags")
      .where(col("doc_id") === 6L).count() == 0L,
      "scrub must name buckets from the stored count, not the caller's")
    assert(spark.read.parquet(s"$target/members")
      .where(col("doc_id") === 6L).count() == 0L)
    // the erased doc was the digest's non-min member; doc 5 keeps the
    // canonical slot and the store still serves the survivor set
    assert(StreamVerdictFlags.flagsFromStore(spark, target)
      .where(col("doc_id") === 5L).select("is_canonical")
      .as[Boolean].head(), "the surviving min keeps the canonical slot")
  }

  /** A tiny 3-doc store (5 and 6 share a digest, 7 is unique) built at
    * a NON-default bucket count — the fixture both failure-mode tests
    * below share. */
  private def buildSmallStore(tag: String): String = {
    val dir = Files.createTempDirectory(tag).toString
    val target = s"$dir/t"
    val docs = Seq(
      (5L, "en", "web", "the quick brown fox jumps over the lazy dog"),
      (6L, "en", "web", "the quick brown fox jumps over the lazy dog"),
      (7L, "en", "web", "an entirely different text about something else"))
    StreamVerdictFlags.compactBatch(target, 4)(
      docs.toDF("doc_id", "lang", "source", "text"), 0L)
    target
  }

  test("absent/torn _buckets meta: scrub falls back to discovery, " +
      "never trusting the caller-default count (r11 ADVICE)") {
    val target = buildSmallStore("verdict_nometa")
    // simulate a legacy target / torn meta: the file is gone, so the
    // true modulus (4) is unknowable — a scrub trusting the default 16
    // would name bucket floorMod(5,16)=5, which does not exist, and the
    // victim would silently survive erasure
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$target/_buckets"), false))
    StreamVerdictFlags.scrub(spark, target, Seq(5L))
    assert(spark.read.parquet(s"$target/flags")
      .where(col("doc_id") === 5L).count() == 0L,
      "discovery fallback must erase the flagged row")
    assert(spark.read.parquet(s"$target/members")
      .where(col("doc_id") === 5L).count() == 0L,
      "members must not keep the victim")
    // 5 was the digest's min: the slot must fall to the survivor 6
    val canon = StreamVerdictFlags.flagsFromStore(spark, target)
      .select(col("doc_id"), col("is_canonical"))
      .as[(Long, Boolean)].collect().toMap
    assert(canon == Map(6L -> true, 7L -> true),
      s"post-scrub canon wrong: $canon")
  }

  test("crash mid-scrub: a rerun completes from every intermediate " +
      "crash point (flags scrubbed last, r11 ADVICE)") {
    // abortAfter 1 = crashed after the members rewrite, 2 = after the
    // canon rewrite; in both states the flags rows still exist, so the
    // rerun re-derives the victim's digest and finishes idempotently
    for (crashPoint <- Seq(1, 2)) {
      val target = buildSmallStore(s"verdict_crash$crashPoint")
      StreamVerdictFlags.scrubSteps(spark, target, Seq(5L), crashPoint)
      StreamVerdictFlags.scrub(spark, target, Seq(5L)) // the rerun
      assert(spark.read.parquet(s"$target/flags")
        .where(col("doc_id") === 5L).count() == 0L,
        s"crash@$crashPoint: rerun must erase the flags row")
      assert(spark.read.parquet(s"$target/members")
        .where(col("doc_id") === 5L).count() == 0L,
        s"crash@$crashPoint: rerun must erase the members row")
      val canon = StreamVerdictFlags.flagsFromStore(spark, target)
        .select(col("doc_id"), col("is_canonical"))
        .as[(Long, Boolean)].collect().toMap
      assert(canon == Map(6L -> true, 7L -> true),
        s"crash@$crashPoint: post-rerun canon wrong: $canon")
    }
  }
}
