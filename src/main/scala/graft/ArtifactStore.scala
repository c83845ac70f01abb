package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType, StringType}

/** Persistent, corpus-fingerprinted artifact store — the cross-run
  * promotion of r6's RunCache (r7 verdict item 3, which it replaces).
  * RunCache materialized a derived frame once per JVM; production
  * pipelines need the derived artifacts (near-dup edges, postings, ANN
  * codebooks) to outlive the job and be REUSED by the next run over
  * the same corpus, while a changed corpus must transparently rebuild. The key is therefore a
  * corpus FINGERPRINT: an order-independent digest of the source table
  * (q110's anti-entropy checksum discipline — commutative h60 sum mod
  * 2⁶¹−1, so the digest is independent of partitioning and row order,
  * and one partial-aggregated scan computes it).
  *
  * Layout: `<root>/<key>/fp-<digest>/(data, manifest.json)`
  * (dash, not `fp=`: a hive-style dir name would collide with the `fp`
  * DATA column under DuckDB's hive-partitioning auto-detection).
  * `<key>` names the artifact AND its build recipe version — a changed
  * algorithm must change the key, or a same-corpus rerun would serve
  * stale semantics. Builds land in a staging dir and are published by
  * one atomic rename, so concurrent processes race safely (the loser
  * deletes its staging dir and reads the winner's artifact) and a
  * crashed build can never leave a half-written artifact behind.
  *
  * The artifact carries its fingerprint as a data column: a consumer
  * globbing `<root>/<key>/ * /data` across corpus versions (the DuckDB
  * oracle does exactly this — it cannot resolve the fp directory name,
  * but it CAN recompute the fingerprint in SQL and filter on the
  * column) selects the matching corpus's rows with a plain predicate.
  * That is what lets the serve queries and their oracles read the SAME
  * trained bytes — [[graft.llm.ServeBooks]].
  */
object ArtifactStore {

  /** 2⁶¹ − 1 — q110's fold modulus (OpsQueries.CkMod). */
  val Mod = 2305843009213693951L

  def root: String =
    sys.env.getOrElse("SPARK_GRAFT_ARTIFACT_DIR", "/root/repo/artifacts")

  // ------------------------------------------------------------ fingerprints

  /** Row digest for the embeddings table: doubles cannot ride a
    * portable text digest (q110's rationale), so the embedding
    * contributes through q116's exact quantization — Σ_d ⌊x_d·10³⌋ is
    * an integer both engines compute bit-identically, value-sensitive
    * to the milli quantum. */
  private[graft] def embeddingsRowDigest: Column = {
    val qs = aggregate(
      transform(col("embedding"),
        x => floor(x.cast(DoubleType) * lit(1000.0)).cast(LongType)),
      lit(0L), (a, b) => a + b)
    call_function("graft_h60", concat(lit("ck|embeddings|"), concat_ws("|",
      coalesce(col("vec_id").cast(StringType), lit("\u0000NULL")),
      coalesce(col("label").cast(StringType), lit("\u0000NULL")),
      qs.cast(StringType))))
  }

  /** ORDER-SENSITIVE per-row certificate for the embeddings-side delta
    * carries (serve cells, PQ codes): h60 of the '|'-joined (vec_id,
    * label, per-component milli quanta in position). The fingerprint
    * term above SUMS the quanta — fine for a corpus-level checksum
    * where per-row collisions wash out in the corpus sum, but as a
    * carry certificate a swapped or sum-compensated component pair
    * would certify "unchanged" and carry stale geometry (cell, codes,
    * raw v) into the new generation. Scala-side only — the oracles
    * never read the sidecars this feeds. */
  private[graft] def embeddingsCarryDigest: Column =
    call_function("graft_h60", concat(lit("carry|embeddings|"),
      concat_ws("|",
        coalesce(col("vec_id").cast(StringType), lit("\u0000NULL")),
        coalesce(col("label").cast(StringType), lit("\u0000NULL")),
        concat_ws(",", transform(col("embedding"),
          x => floor(x.cast(DoubleType) * lit(1000.0))
            .cast(LongType).cast(StringType))))))

  /** SQL twin of the embeddings fingerprint — a scalar subquery the
    * oracle inlines to select the artifact rows for ITS corpus. */
  val embeddingsFpSql: String =
    """(SELECT (sum(('0x' || substr(md5('ck|embeddings|' ||
      |    concat_ws('|',
      |      coalesce(vec_id::VARCHAR, chr(0) || 'NULL'),
      |      coalesce(label::VARCHAR, chr(0) || 'NULL'),
      |      list_sum(list_transform(embedding,
      |        x -> floor(x::DOUBLE * 1000)::BIGINT))::BIGINT::VARCHAR)),
      |  1, 15))::BIGINT::HUGEINT) % 2305843009213693951)::BIGINT
      | FROM embeddings)""".stripMargin

  /** Documents fingerprint = q110's `documents` sum_digest, verbatim
    * (same tag, same key columns) — the checksum the verdict named as
    * the manifest key. */
  private def documentsRowDigest: Column =
    queries.OpsQueries.checksumHash("documents",
      Seq("doc_id", "text", "lang", "source", "n_chars"))

  private val fpMemo = new ConcurrentHashMap[(String, String), java.lang.Long]()

  private def fpOf(s: SparkSession, dir: String, table: String,
                   digest: => Column): Long =
    fpMemo.computeIfAbsent((dir, table), _ => {
      val r = Tables.load(s, dir, table)
        .select(digest.as("h"))
        .agg((sum(col("h").cast(DecimalType(38, 0))) % lit(Mod))
          .cast(LongType).as("fp"))
        .head().getLong(0)
      Long.box(r)
    })

  def embeddingsFp(s: SparkSession, dir: String): Long =
    fpOf(s, dir, "embeddings", embeddingsRowDigest)

  def documentsFp(s: SparkSession, dir: String): Long =
    fpOf(s, dir, "documents", documentsRowDigest)

  // ------------------------------------------------------------ store

  /** Build-thunk invocations, observable by ArtifactStoreSpec's
    * "second session builds nothing" assertion. */
  private[graft] val buildCount = new ConcurrentHashMap[String, Integer]()

  private val memo = new ConcurrentHashMap[String, String]()

  /** Per-artifact build locks. Builds must NOT run inside
    * `memo.computeIfAbsent`: several builders are themselves artifact
    * consumers (the vec-codebook family materializes the
    * `vec_tombstones_v1` artifact from inside its build thunk), and
    * CHM's contract forbids a mapping function from touching the map —
    * a nested parquetOnce whose key hashes into the same bin can throw
    * "Recursive update" or deadlock, dependent on the artifact-root
    * string hashes. Double-checked per-key monitors make nested
    * different-key builds safe (the dependency graph is acyclic), and
    * `synchronized` is thread-reentrant so even a same-key cycle would
    * fail loudly in the build rather than deadlock. */
  private val buildLocks = new ConcurrentHashMap[String, Object]()

  /** Drop the in-process memo — simulates a fresh JVM for specs; the
    * on-disk artifacts are the state under test. */
  private[graft] def resetMemoForTest(): Unit = memo.clear()

  /** Glob the oracle reads for artifact `key` (all corpus versions —
    * filter on the `fp` column with the matching fingerprint SQL). */
  def sqlGlob(key: String): String = s"$root/$key/*/data/*.parquet"

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val children = Files.list(p)
      try children.forEach(deleteRecursively(_)) finally children.close()
    }
    Files.deleteIfExists(p)
  }

  /** Data directory of the (key, fp) artifact — the path
    * [[parquetOnce]] reads; exposed for consumers that must pin the
    * path at a point in time (a serve stream freezing its corpus view
    * at start) or scrub partitions in place. */
  def dataPath(key: String, fp: Long): String =
    Paths.get(root, key, s"fp-$fp", "data").toString

  /** Every published fingerprint of `key` (manifest present) — the
    * enumeration surface for cross-generation maintenance (takedown
    * scrubs, [[invalidateAllFps]]). */
  def publishedFps(key: String): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val base = Paths.get(root, key)
    if (!Files.isDirectory(base)) return Seq.empty
    val kids = Files.list(base)
    try kids.iterator().asScala.toSeq
      .filter(p => p.getFileName.toString.startsWith("fp-") &&
        Files.exists(p.resolve("manifest.json")))
      .map(_.getFileName.toString.stripPrefix("fp-").toLong)
    finally kids.close()
  }

  /** [[invalidate]] across every published fingerprint of `key`. */
  def invalidateAllFps(key: String): Unit =
    publishedFps(key).foreach(invalidate(key, _))

  /** The artifact for (key, fp): read if published, else build once and
    * publish atomically. The returned frame READS the parquet (lineage
    * truncated at a file source, never pinned executor memory), and carries the
    * fingerprint as column `fp`. */
  def parquetOnce(s: SparkSession, key: String, fp: Long)
                 (build: => DataFrame): DataFrame =
    parquetOnceImpl(s, key, fp, Seq.empty)(build)

  /** [[parquetOnce]] with the data laid out hive-partitioned by
    * `partitionCols` — for artifacts whose consumers prune by a key
    * column per read (the ANN serve cells: each micro-batch reads only
    * its probed cells' directories). Partition columns come back
    * integer-typed from directory-name inference; consumers re-cast. */
  def parquetOncePartitioned(s: SparkSession, key: String, fp: Long,
                             partitionCols: Seq[String])
                            (build: => DataFrame): DataFrame =
    parquetOnceImpl(s, key, fp, partitionCols)(build)

  private def parquetOnceImpl(s: SparkSession, key: String, fp: Long,
                              partitionCols: Seq[String])
                             (build: => DataFrame): DataFrame = {
    val dir = Paths.get(root, key, s"fp-$fp")
    val dirKey = dir.toString
    if (memo.get(dirKey) == null) {
      val lock = buildLocks.computeIfAbsent(dirKey, _ => new Object)
      lock.synchronized {
        if (memo.get(dirKey) == null) {
          if (!Files.exists(dir.resolve("manifest.json"))) {
            buildCount.merge(key, Int.box(1), (a, b) => Int.box(a + b))
            val tmp = Paths.get(root, key,
              s".tmp-${java.util.UUID.randomUUID.toString.take(8)}")
            Files.createDirectories(tmp)
            val w = build.withColumn("fp", lit(fp)).write
            (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*)
             else w)
              .mode("overwrite").parquet(tmp.resolve("data").toString)
            Files.writeString(tmp.resolve("manifest.json"),
              s"""{"key":"$key","fp":$fp,""" +
                s""""created":"${java.time.Instant.now}"}\n""")
            try Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
            catch {
              // lost a publish race to a concurrent process: its
              // artifact is complete (rename is atomic) — discard
              // ours, read theirs
              case _: java.nio.file.FileAlreadyExistsException =>
                deleteRecursively(tmp)
              case _: java.nio.file.FileSystemException
                if Files.exists(dir.resolve("manifest.json")) =>
                deleteRecursively(tmp)
            }
          }
          memo.put(dirKey, dirKey)
        }
      }
    }
    s.read.parquet(s"$dirKey/data")
  }

  /** [[parquetOnce]] keyed by the documents-corpus fingerprint, with
    * the fp column dropped on read — the convenience form for the
    * derived text artifacts (postings, doc lengths, near-dup edges)
    * whose consumers are Scala-side only; the DuckDB oracles for those
    * queries recompute from the corpus and never read the artifact. */
  def documentsArtifact(s: SparkSession, dir: String, key: String)
                       (build: => DataFrame): DataFrame =
    parquetOnce(s, key, documentsFp(s, dir))(build).drop("fp")

  // ------------------------------------------------------ delta generations

  /** (carried docs, delta-built docs) of the last delta-path build per
    * key — spec observability for "generation N+1 derived only the
    * appended docs" (ArtifactDeltaSpec). Full builds record (-1, -1). */
  private[graft] val deltaStats = new ConcurrentHashMap[String, (Long, Long)]()

  /** The carry algebra every delta family shares (documents rows,
    * serve cells, PQ codes): split the current corpus's (id, digest)
    * certificate frame against a prior generation's into the unchanged
    * ids (carry) and changed/new ids (rebuild), recording the counts
    * under `statsKey`. ONE join materialized once (localCheckpoint) —
    * both id frames and the stats read the same tagged pass, so the
    * build adds one key-sized job, not three. Returns
    * (unchangedIds, changedIds, curKeys-checkpointed) — the caller
    * reuses the checkpointed certificate for its sidecar write instead
    * of re-scanning the corpus. */
  private[graft] def deltaSplit(statsKey: String, idCol: String,
                                curKeys: DataFrame, priorKeys: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val tagged = curKeys
      .join(priorKeys.select(col(idCol), col("digest"))
        .withColumn("_hit", lit(1)), Seq(idCol, "digest"), "left")
      .select(col(idCol), col("digest"),
        coalesce(col("_hit"), lit(0)).as("_hit"))
      .localCheckpoint()
    val byHit = tagged.groupBy(col("_hit")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    deltaStats.put(statsKey,
      (byHit.getOrElse(1, 0L), byHit.getOrElse(0, 0L)))
    (tagged.where(col("_hit") === 1).select(col(idCol)),
      tagged.where(col("_hit") === 0).select(col(idCol)),
      tagged.select(col(idCol), col("digest")))
  }

  /** The (doc_id, digest) sidecar recording WHICH corpus a generation
    * was built from — the delta path's carry certificate. The digest is
    * [[documentsRowDigest]], the SAME per-row hash the corpus
    * fingerprint sums, so it certifies every fingerprinted column
    * (doc_id, text, lang, source, n_chars) — a doc whose text survived
    * a re-crawl but whose source moved is rebuilt, keeping the carry
    * safe for any doc-local family, not just text-derived ones. */
  private def docsSidecarPath(key: String, fp: Long): Path =
    Paths.get(root, key, s"fp-$fp", "docs")

  private def docKeysFrame(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), documentsRowDigest.as("digest"))

  /** `docKeys` is BY-NAME: the existence check is the hot path (every
    * artifact read lands here) and must not construct the corpus frame
    * or its digest projection — an eager argument measured as a flat
    * +0.1–0.2 s on every dedup-audit query at sf0.1. */
  private def ensureDocsSidecar(s: SparkSession, key: String, fp: Long,
                                docKeys: => DataFrame): Unit = {
    val p = docsSidecarPath(key, fp)
    if (Files.exists(p)) return
    val tmp = Paths.get(root, key, s"fp-$fp",
      s".docs-tmp-${java.util.UUID.randomUUID.toString.take(8)}")
    docKeys.write.mode("overwrite").parquet(tmp.toString)
    try Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
    catch { case e: java.nio.file.FileSystemException =>
      // swallow ONLY a lost publish race (the winner's sidecar exists);
      // a genuine move failure must not silently disable the delta
      // path forever (parquetOnceImpl's guard, applied here)
      if (Files.exists(p)) deleteRecursively(tmp) else throw e
    }
  }

  /** The newest OTHER published generation of `key` that carries a
    * docs sidecar — the delta build's base. Sidecar-less generations
    * (crash before the ensure, pre-delta era) are skipped: without the
    * certificate nothing can be carried. */
  private def priorGeneration(key: String, fp: Long): Option[Long] =
    publishedFps(key)
      .filter(p => p != fp && Files.exists(docsSidecarPath(key, p)))
      .sortBy(p => Files.getLastModifiedTime(
        Paths.get(root, key, s"fp-$p", "manifest.json")).toMillis)
      .lastOption

  /** [[documentsArtifact]] for CORPUS-LINEAR, DOC-LOCAL families
    * (every output row is a pure function of its own document's
    * content — shingle hashes, minhash signatures): generation N+1 is
    * built from generation N plus the document delta instead of
    * re-deriving the whole corpus (r11 verdict item 3 — at 100 TB you
    * cannot re-shingle the corpus because 1 GB arrived). q87's digest
    * anti-join idiom, applied to the store itself:
    *
    *  - each generation publishes a (doc_id, digest) sidecar naming
    *    the exact corpus it was built from;
    *  - the next corpus version CARRIES the prior generation's rows
    *    for every doc whose (doc_id, digest) is unchanged — doc-local
    *    derivation makes those rows byte-identical to a fresh build by
    *    construction — and runs `buildFor` ONLY over the changed/new
    *    docs (removed docs drop out of the carry semi-join);
    *  - no prior generation (first touch, or every prior invalidated
    *    by the takedown cascade) → full build, same as
    *    [[documentsArtifact]].
    *
    * Scale shape: the derive cost (shingle explode + md5 + 16
    * permutations per shingle — the dominant term) becomes O(delta);
    * what stays corpus-linear is one digest SCAN of the new corpus
    * (the unavoidable certificate — md5 of each text, computed once
    * via localCheckpoint and reused by both joins) and the carried
    * rows' REWRITE into the new generation (sequential parquet I/O; a
    * partition-level carry could remove even that, documented as the
    * next step if append cadence ever makes the copy the bottleneck).
    * The quadratic audit families (brute_pair_stats_v1,
    * banded_cand_nmatch_v1) deliberately keep full rebuild: their rows
    * are PAIR-local, so an appended doc invalidates rows it never
    * appears in. */
  def documentsDeltaArtifact(s: SparkSession, dir: String, key: String)
                            (buildFor: DataFrame => DataFrame): DataFrame = {
    val fp = documentsFp(s, dir)
    def docs = Tables.documents(s, dir)
    // the delta path's checkpointed certificate, reused by the sidecar
    // write below so a new generation digests the corpus ONCE
    var certKeys: Option[DataFrame] = None
    val out = parquetOnce(s, key, fp) {
      priorGeneration(key, fp) match {
        case Some(pfp) =>
          val priorKeys = s.read.parquet(docsSidecarPath(key, pfp).toString)
          val (unchangedIds, changedIds, keys) =
            deltaSplit(key, "doc_id", docKeysFrame(docs), priorKeys)
          certKeys = Some(keys)
          val fresh = buildFor(
            docs.join(changedIds, Seq("doc_id"), "left_semi"))
          val carried = s.read.parquet(s"${dataPath(key, pfp)}").drop("fp")
            .join(unchangedIds, Seq("doc_id"), "left_semi")
          fresh.unionByName(carried.select(fresh.columns.map(col): _*))
        case None =>
          deltaStats.put(key, (-1L, -1L))
          buildFor(docs)
      }
    }
    // write-if-absent AFTER the atomic publish (a crash in between
    // self-heals on the next touch; a sidecar-less generation is simply
    // never used as a delta base); by-name arg — repeat reads pay one
    // local existence check
    ensureDocsSidecar(s, key, fp, certKeys.getOrElse(docKeysFrame(docs)))
    out.drop("fp")
  }

  /** Janitor: keep the `keep` most recently PUBLISHED fingerprints of
    * `key`, delete the rest (manifest write time orders publications).
    * Corpus versions accumulate one fp dir per regeneration; a
    * retention of a few generations covers concurrent readers of the
    * previous corpus while bounding disk. NOT auto-invoked — deletion
    * under a live reader is an operator's call, so this is the
    * explicit janitor-job API (same posture as compaction q120).
    * Returns the deleted fingerprint dirs. */
  def gcKeepLatest(key: String, keep: Int): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val base = Paths.get(root, key)
    if (!Files.isDirectory(base)) return Seq.empty
    val kids = Files.list(base)
    val fps =
      try kids.iterator().asScala.toSeq
        .filter(p => p.getFileName.toString.startsWith("fp-") &&
          Files.exists(p.resolve("manifest.json")))
        .sortBy(p =>
          Files.getLastModifiedTime(p.resolve("manifest.json")).toMillis)
      finally kids.close()
    val doomed = fps.dropRight(keep)
    doomed.foreach { p =>
      memo.remove(p.toString)
      deleteRecursively(p)
    }
    doomed.map(_.getFileName.toString)
  }

  /** Drop a published artifact (the takedown-cascade invalidation
    * path): removes the fp dir and the in-process memo entry so the
    * next consumer rebuilds from the live corpus. Serialized through
    * the same per-key build lock as [[parquetOnce]]: an unlocked
    * remove+delete interleaved with an in-flight build could land
    * between the builder's manifest check and its `memo.put`, leaving
    * the memo claiming a just-deleted artifact is published. */
  def invalidate(key: String, fp: Long): Unit = {
    val dir = Paths.get(root, key, s"fp-$fp")
    val dirKey = dir.toString
    buildLocks.computeIfAbsent(dirKey, _ => new Object).synchronized {
      memo.remove(dirKey)
      if (Files.exists(dir)) deleteRecursively(dir)
    }
  }
}
