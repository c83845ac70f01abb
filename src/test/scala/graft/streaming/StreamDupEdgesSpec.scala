package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** The edge artifact's streaming maintainer: a document stream split
  * across micro-batches compacts to EXACTLY the batch `minhash_pairs`
  * artifact (row-for-row), the cluster labels served from either edge
  * source are identical, and replaying a batch is a no-op.
  */
class StreamDupEdgesSpec extends SparkSpec {
  import spark.implicits._

  private type Doc = (Long, String)

  private lazy val docs: Seq[Doc] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq

  private def edgeSet(target: String): Set[(Long, Long)] =
    StreamDupEdges.edges(spark, target)
      .as[(Long, Long)].collect().toSet

  test("stream-compacted edges == batch artifact; labels serve " +
      "identically from either; replay is a no-op") {
    val dir = Files.createTempDirectory("dup_edges_stream").toString
    val target = s"$dir/edges_target"
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Doc]
      val q = StreamDupEdges.start(
        stream.toDF().toDF("doc_id", "text"),
        target, s"$dir/ckpt", buckets = 4)
      try {
        // three batches, split mid-corpus so near-dup pairs straddle
        // batch boundaries (the case a per-batch q27 re-run misses)
        val (a, rest) = docs.splitAt(docs.size / 3)
        val (b, c) = rest.splitAt(rest.size / 3)
        Seq(a, b, c).foreach { bt => stream.addData(bt); q.processAllAvailable() }
      } finally q.stop()
    }

    val batchPairs = graft.queries.DedupQueries
      .minhashPairsArtifact(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    assert(batchPairs.nonEmpty, "witness: the corpus must have near-dups")
    assert(edgeSet(target) == batchPairs,
      "stream-built edge set must equal the batch artifact row-for-row")

    // the sigs store serves the batch minhash_sig3_v1 artifact's rows
    // exactly — signatures are row-local per doc, so the three-way
    // batch split cannot change them, and a live pipeline re-dials
    // its banding without re-hashing a shingle
    def sigRows(df: org.apache.spark.sql.DataFrame): Set[Seq[Long]] =
      df.collect().map(_.toSeq.map(_.asInstanceOf[Long])).toSet
    assert(sigRows(StreamDupEdges.sigsFromStore(spark, target)) ==
      sigRows(graft.queries.DedupQueries.minhashSig3(spark, sfDir)),
      "stream-built sigs store must equal the batch sig artifact")

    // q177's novelty audit serves identically from the stream store
    // (same distinct (doc_id, hash) rows, same rollup) — the live
    // dashboard path never re-shingles the corpus
    val streamNov = StreamDupEdges.noveltyFromStore(spark, target)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val batchNov = graft.SparkEntry.queries("q177_ngram_novelty")(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(streamNov == batchNov,
      "novelty from the stream store must equal batch q177 row-for-row")

    // q180's threshold sweep serves identically from the stream-
    // maintained exact-pair store (r10 verdict item 5) — re-dialing
    // the merge threshold never recomputes a signature
    val streamSweep = StreamDupEdges.sweepFromStore(spark, target)
      .as[(Long, Long, Long)].collect().toSeq
    val batchSweep = graft.SparkEntry
      .queries("q180_dedup_threshold_sweep")(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(streamSweep == batchSweep,
      "sweep from the stream store must equal batch q180 row-for-row")

    // q73's consumers serve identically from either edge source
    val streamLabels = graft.queries.DedupQueries
      .clusterLabelsOver(StreamDupEdges.edges(spark, target))
      .select("id", "comp").as[(Long, Long)].collect().toSet
    val batchLabels = graft.SparkEntry.queries("q73_dedup_clusters")(spark, sfDir)
      .select("doc_id", "comp").as[(Long, Long)].collect().toSet
    assert(streamLabels == batchLabels,
      "clusters from stream edges must equal the served batch clusters")

    // replay: re-compacting an already-merged batch leaves every store
    // byte-equal (at-least-once delivery / checkpoint replay safety)
    def snapshot(): (Set[(Long, Long)], Long, Long) = (
      edgeSet(target),
      spark.read.parquet(s"$target/shingles").count(),
      spark.read.parquet(s"$target/bands").count())
    val before = snapshot()
    val (_, rest) = docs.splitAt(docs.size / 3)
    val (b, _) = rest.splitAt(rest.size / 3)
    StreamDupEdges.compactBatch(target, 4)(
      b.toDF("doc_id", "text"), 1L)
    assert(snapshot() == before, "replay mutated a store")

    // takedown leg: a flagged doc vanishes from every store — its
    // shingle hashes, its band keys, and any edge citing it — and a
    // second pass is a no-op
    val victim = batchPairs.head._1
    StreamDupEdges.scrub(spark, target, Seq(victim))
    assert(!edgeSet(target).exists(e => e._1 == victim || e._2 == victim),
      "scrubbed doc still cited by an edge")
    assert(spark.read.parquet(s"$target/shingles")
      .where($"doc_id" === victim).count() == 0L)
    assert(spark.read.parquet(s"$target/bands")
      .where($"doc_id" === victim).count() == 0L)
    assert(spark.read.parquet(s"$target/sigs")
      .where($"doc_id" === victim).count() == 0L,
      "scrubbed doc still has a stored signature")
    assert(spark.read.parquet(s"$target/cand")
      .where($"da" === victim || $"db" === victim).count() == 0L,
      "scrubbed doc still cited by a stored pair fact")
    val afterScrub = snapshot()
    StreamDupEdges.scrub(spark, target, Seq(victim))
    assert(snapshot() == afterScrub, "second scrub pass mutated a store")

    // erasure survives REPLAY (r13 self-review finding 4): a checkpoint
    // replay of the pre-scrub batches re-derives the victim's shingle/
    // sig/band/edge rows, and without the registry gate the distinct
    // merges would re-insert them with nothing left to re-scrub
    val (ra, rrest) = docs.splitAt(docs.size / 3)
    val (rb, rc) = rrest.splitAt(rrest.size / 3)
    Seq(ra, rb, rc).zipWithIndex.foreach { case (bt, i) =>
      StreamDupEdges.compactBatch(target, 4)(bt.toDF("doc_id", "text"), i.toLong)
    }
    assert(spark.read.parquet(s"$target/shingles")
      .where($"doc_id" === victim).count() == 0L,
      "replay after takedown must not resurrect the victim's shingles")
    assert(!edgeSet(target).exists(e => e._1 == victim || e._2 == victim),
      "replay after takedown must not resurrect the victim's edges")
    assert(snapshot() == afterScrub,
      "the post-takedown replay must be a no-op for surviving rows too")

    // ...but erasure is retroactive, never prospective: a genuinely NEW
    // batch (id above the scrub's recorded window) re-adding the same
    // doc id indexes normally
    val victimDoc = docs.find(_._1 == victim).get
    StreamDupEdges.compactBatch(target, 4)(Seq(victimDoc).toDF("doc_id", "text"), 99L)
    assert(spark.read.parquet(s"$target/shingles")
      .where($"doc_id" === victim).count() > 0L,
      "a post-takedown re-add (new batch id) must index normally")
  }

  test("janitor: evicts upstream-removed docs, bounds files, serves identically") {
    val dir = Files.createTempDirectory("dup_edges_janitor").toString
    val target = s"$dir/edges_target"
    // build the stores over several merges so buckets fragment
    val thirds = {
      val (a, rest) = docs.splitAt(docs.size / 3)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c)
    }
    thirds.zipWithIndex.foreach { case (bt, i) =>
      StreamDupEdges.compactBatch(target, 4)(bt.toDF("doc_id", "text"), i.toLong)
    }
    val before = edgeSet(target)
    assert(before.nonEmpty, "witness: the corpus must have near-dups")

    def bucketFiles(sub: String): Map[String, Int] = {
      val root = new org.apache.hadoop.fs.Path(s"$target/$sub")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).filter(_.getPath.getName.startsWith("bucket="))
        .map(d => d.getPath.getName -> fs.listStatus(d.getPath)
          .count(_.getPath.getName.endsWith(".parquet"))).toMap
    }

    // 1. all docs live: nothing evicted, fragmentation compacted to 1
    StreamDupEdges.janitor(spark, target,
      docs.toDF("doc_id", "text"), maxFilesPerBucket = 1)
    assert(edgeSet(target) == before, "compaction changed the served edges")
    Seq("shingles", "sigs", "bands", "edges").foreach { sub =>
      assert(bucketFiles(sub).values.forall(_ <= 1),
        s"$sub still fragmented after the janitor: ${bucketFiles(sub)}")
    }

    // 2. a doc removed upstream vanishes from every store
    val victim = before.head._1
    val live = docs.filterNot(_._1 == victim)
    StreamDupEdges.janitor(spark, target, live.toDF("doc_id", "text"))
    assert(!edgeSet(target).exists(e => e._1 == victim || e._2 == victim),
      "evicted doc still cited by an edge")
    assert(spark.read.parquet(s"$target/shingles")
      .where($"doc_id" === victim).count() == 0L)
    assert(spark.read.parquet(s"$target/sigs")
      .where($"doc_id" === victim).count() == 0L)
    assert(spark.read.parquet(s"$target/bands")
      .where($"doc_id" === victim).count() == 0L)

    // 3. second pass is a no-op (file-level snapshot equality)
    def snapshot(): Seq[(String, Long, Long)] = {
      val fs = new org.apache.hadoop.fs.Path(target)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq("shingles", "sigs", "bands", "edges").flatMap { sub =>
        val root = new org.apache.hadoop.fs.Path(s"$target/$sub")
        fs.listStatus(root).flatMap(d => fs.listStatus(d.getPath))
          .filter(_.getPath.getName.endsWith(".parquet"))
          .map(f => (f.getPath.toString, f.getLen, f.getModificationTime))
          .toSeq
      }
    }
    val snap = snapshot()
    StreamDupEdges.janitor(spark, target, live.toDF("doc_id", "text"),
      maxFilesPerBucket = 1)
    assert(snapshot() == snap, "idle janitor pass rewrote files")
  }

  test("scrub names the shingles/sigs buckets driver-side: row parity " +
      "with the discovery-scan fallback, strictly fewer records read") {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val dir = Files.createTempDirectory("dup_edges_known").toString
    val target = s"$dir/known"
    val thirds = {
      val (a, rest) = docs.splitAt(docs.size / 3)
      val (b, c) = rest.splitAt(rest.size / 3)
      Seq(a, b, c)
    }
    thirds.zipWithIndex.foreach { case (bt, i) =>
      StreamDupEdges.compactBatch(target, 4)(bt.toDF("doc_id", "text"), i.toLong)
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(target).getFileSystem(conf)
    assert(fs.exists(new Path(s"$target/_buckets")),
      "the stream must self-describe its bucket count")

    // legacy twin: identical stores minus the meta file — scrub must
    // fall back to the discovery scan and land on the SAME rows
    val legacy = s"$dir/legacy"
    FileUtil.copy(fs, new Path(target), fs, new Path(legacy), false, conf)
    fs.delete(new Path(s"$legacy/_buckets"), false)

    // records-read instrument (ZorderRewriteSpec's settle idiom — the
    // listener bus is async)
    class InputRecords extends org.apache.spark.scheduler.SparkListener {
      val records = new java.util.concurrent.atomic.LongAdder
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          records.add(e.taskMetrics.inputMetrics.recordsRead)
      def settle(): Long = {
        var prev = -1L; var cur = records.sum(); var i = 0
        while (cur != prev && i < 50) {
          prev = cur; Thread.sleep(50); cur = records.sum(); i += 1
        }
        cur
      }
    }
    def readsDuring(body: => Unit): Long = {
      val l = new InputRecords
      spark.sparkContext.addSparkListener(l)
      try { body; l.settle() }
      finally spark.sparkContext.removeSparkListener(l)
    }

    // a MID-RANGE victim: the fallback's discovery scan must not get
    // rescued by parquet min/max page stats (an extreme id — the
    // corpus min — is excluded by every other bucket's page ranges,
    // which would make the full scan accidentally as cheap as the
    // named read and void the comparison)
    val victim = {
      val ids = spark.read.parquet(s"$target/shingles")
        .select("doc_id").distinct().as[Long].collect().sorted
      ids(ids.length / 2)
    }
    val knownReads = readsDuring(
      StreamDupEdges.scrub(spark, target, Seq(victim)))
    val legacyReads = readsDuring(
      StreamDupEdges.scrub(spark, legacy, Seq(victim)))

    // parity: both paths leave every store row-identical
    Seq("shingles", "sigs", "bands", "cand", "edges").foreach { sub =>
      assert(fs.exists(new Path(s"$target/$sub")) ==
        fs.exists(new Path(s"$legacy/$sub")), s"$sub existence diverged")
      if (fs.exists(new Path(s"$target/$sub"))) {
        def rows(t: String): Set[String] =
          spark.read.parquet(s"$t/$sub").collect().map(_.toString).toSet
        assert(rows(target) == rows(legacy),
          s"$sub diverged between the named-bucket and fallback scrubs")
      }
    }
    assert(spark.read.parquet(s"$target/shingles")
      .where($"doc_id" === victim).count() == 0L, "victim survived")
    // the point of the meta file: the named-bucket path reads strictly
    // less than the store-wide discovery scan
    assert(knownReads < legacyReads,
      s"named-bucket scrub read $knownReads records, " +
        s"fallback $legacyReads — pruning is not happening")
  }

  test("_buckets contract: mismatched restart fails loud; torn meta " +
      "falls back to discovery and is repaired by the next batch") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("dup_edges_meta").toString
    val target = s"$dir/t"
    val dupDocs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "the quick brown fox jumps over the lazy dog today"))
    StreamDupEdges.compactBatch(target, 4)(dupDocs.toDF("doc_id", "text"), 0L)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(target).getFileSystem(conf)
    def metaText: String = {
      val in = fs.open(new Path(s"$target/_buckets"))
      try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
    }
    assert(metaText == "4")

    // 1. a restart with a DIFFERENT bucket count must fail loud:
    //    rows merged under the new modulus would sit in partitions the
    //    named takedown scrub never visits and silently survive erasure
    val e = intercept[IllegalArgumentException](
      StreamDupEdges.compactBatch(target, 8)(
        dupDocs.toDF("doc_id", "text"), 1L))
    assert(e.getMessage.contains("4"), e.getMessage)

    // 2. a torn meta write (zero-byte file — crash between create and
    //    write) must not wedge scrub: the unparseable file reads as
    //    absent and the takedown falls back to the discovery scan
    fs.create(new Path(s"$target/_buckets"), true).close()
    StreamDupEdges.scrub(spark, target, Seq(10L))
    assert(spark.read.parquet(s"$target/shingles")
      .where($"doc_id" === 10L).count() == 0L,
      "scrub under a torn meta file must still erase via discovery")
    // ...and the next merged batch repairs the meta file in place
    StreamDupEdges.compactBatch(target, 4)(
      Seq((12L, "some entirely fresh text about nothing in particular at all"))
        .toDF("doc_id", "text"), 2L)
    assert(metaText == "4", "the torn meta file must be rewritten")
  }

  test("an edge-free stream prefix does not poison the edges store") {
    val dir = Files.createTempDirectory("dup_edges_empty").toString
    val target = s"$dir/edges_target"
    // batch 1: docs with shingles but zero near-dup pairs — the common
    // case. Before the fix this wrote a parquet-less _SUCCESS-only
    // edges dir that wedged every later read (incl. checkpoint replay).
    val distinctDocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "red orange yellow green blue indigo violet"))
    StreamDupEdges.compactBatch(target, 4)(
      distinctDocs.toDF("doc_id", "text"), 0L)
    // consumers see the empty edge set, not an AnalysisException
    assert(StreamDupEdges.edges(spark, target).count() == 0L)
    // ...and the threshold sweep answers its 6 zero rows over the
    // never-written pair store, exactly like batch q180 on a
    // pair-free corpus
    assert(StreamDupEdges.sweepFromStore(spark, target)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.map(t => (t._2, t._3)).forall(_ == (0L, 0L)) &&
      StreamDupEdges.sweepFromStore(spark, target).count() == 6L,
      "sweep over an empty pair store must be the 6 zero rows")
    // replaying the edge-free batch (checkpoint restart) must not crash
    StreamDupEdges.compactBatch(target, 4)(
      distinctDocs.toDF("doc_id", "text"), 0L)
    // scrub against the never-written edges store is a no-op, not a crash
    StreamDupEdges.scrub(spark, target, Seq(1L))
    // batch 2: a genuine near-dup pair — the store recovers into a
    // normal readable edges target
    val dupDocs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "the quick brown fox jumps over the lazy dog today"))
    StreamDupEdges.compactBatch(target, 4)(
      dupDocs.toDF("doc_id", "text"), 1L)
    assert(edgeSet(target) == Set((10L, 11L)),
      "edges written after an edge-free prefix must serve normally")
  }
}
