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

  /** (listing signature → fp) per (dir, table): the in-JVM memo is
    * validated against the CURRENT file listing on every call, so an
    * appended corpus is visible without a JVM restart (the pre-r13
    * memo assumed immutable corpus dirs — true of the testdata, false
    * of a production store that appends in place). A listing is one
    * metadata pass; at 100 TB the file inventory is the table format's
    * manifest and this stays metadata-priced. */
  private val fpMemo =
    new ConcurrentHashMap[(String, String), (String, java.lang.Long)]()

  /** The corpus files the last [[fpOf]] call actually SCANNED, per
    * (dir, table) — the spec pin for "an append re-reads only the
    * appended files" (ArtifactCarrySpec). */
  private[graft] val fpScanned =
    new ConcurrentHashMap[(String, String), Seq[String]]()

  private def fpCachePath(dir: String, table: String): org.apache.hadoop.fs.Path = {
    // readable prefix + full-string hash suffix; a collision is only a
    // cache MISS (entries validate by absolute path), never a wrong fp
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(48)
    val h = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    new org.apache.hadoop.fs.Path(root, s"_fpcache/$table-$safe-$h")
  }

  /** FILE-INCREMENTAL corpus fingerprint (r12 verdict item 1): the
    * per-row digests sum, so fp = (Σ per-file sums) mod M — unchanged
    * files (same path+size+mtime as the cached manifest) contribute
    * their recorded sums and only new/changed files are scanned. First
    * touch (no cache) scans everything once and writes the manifest;
    * the exact fp VALUE is unchanged from the full-scan form, so every
    * published artifact key and every oracle's SQL fingerprint twin
    * still match. Fails LOUD if a scanned file's rows cannot be
    * attributed back to it (normalization drift would otherwise
    * silently zero its contribution). */
  private def fpOf(s: SparkSession, dir: String, table: String,
                   digest: => Column, cacheTag: String = null): Long = {
    // cacheTag separates fp caches when TWO different digests read the
    // same table (the lineitem graph fp digests only the two graph
    // columns) — a shared cache would serve one digest's sums to the
    // other and silently mislabel every generation
    val tag = if (cacheTag == null) table else cacheTag
    val key = (dir, tag)
    val listing = graft.sources.CorpusFiles.list(s, dir, table)
    val sig = listing.map { case (p, sz, mt) => s"$p|$sz|$mt" }.mkString("\n")
    val memo = fpMemo.get(key)
    if (memo != null && memo._1 == sig) return memo._2
    val cache = fpCachePath(dir, tag)
    val fs = cache.getFileSystem(s.sparkContext.hadoopConfiguration)
    val prior = graft.sources.CorpusFiles.readManifest(fs, cache)
      .getOrElse(Map.empty[String, (Long, Long, Long)])
    val (unchanged, changed) = listing.partition { case (p, sz, mt) =>
      prior.get(p).exists { case (s0, m0, _) => s0 == sz && m0 == mt }
    }
    val sums = graft.sources.CorpusFiles.fileSums(s, changed.map(_._1), digest)
    fpScanned.put(key, changed.map(_._1))
    val unknown = sums.keySet -- changed.map(_._1).toSet
    require(unknown.isEmpty,
      s"fp scan attributed rows to unlisted files $unknown — " +
        "source-path normalization drifted; refusing a silent wrong fp")
    val entries = unchanged.map { case (p, sz, mt) => (p, sz, mt, prior(p)._3) } ++
      changed.map { case (p, sz, mt) =>
        val sum = sums.get(p).map(_._1).getOrElse {
          // absent from the grouped scan: legitimate ONLY for a
          // zero-row part file — verify rather than assume
          val n = s.read.parquet(p).count()
          require(n == 0L,
            s"fp scan lost $n rows of $p — source-path normalization " +
              "drifted; refusing a silent wrong fp")
          0L
        }
        (p, sz, mt, sum)
      }
    val fp = entries.map(e => BigInt(e._4)).sum.mod(BigInt(Mod)).toLong
    graft.sources.CorpusFiles.writeManifest(fs, cache, entries)
    fpMemo.put(key, (sig, Long.box(fp)))
    fp
  }

  def embeddingsFp(s: SparkSession, dir: String): Long =
    fpOf(s, dir, "embeddings", embeddingsRowDigest)

  def documentsFp(s: SparkSession, dir: String): Long =
    fpOf(s, dir, "documents", documentsRowDigest)

  /** Lineitem fingerprint over ONLY the graph columns (l_suppkey,
    * l_partkey) — the key of the supplier–part co-occurrence graph
    * artifacts (q91's edge list and degrees, r16 verdict item 2). A
    * lineitem append that touches no (supplier, part) combination the
    * graph hasn't seen still changes this fp (the digest sums row
    * multiplicity) — a rebuild more than strictly necessary, but the
    * fp must be computable without the distinct-pair shuffle it
    * exists to avoid; columns OUTSIDE the pair (prices, dates) never
    * invalidate it because they never enter the digest. File-
    * incremental like every fpOf (own cacheTag: the same table could
    * later carry a full-row fingerprint without cache collision). */
  def lineitemGraphFp(s: SparkSession, dir: String): Long =
    fpOf(s, dir, "lineitem",
      queries.OpsQueries.checksumHash("lineitem_sp",
        Seq("l_suppkey", "l_partkey")),
      cacheTag = "lineitem_sp")

  /** Customer fingerprint over ONLY c_name — the key of the fuzzy
    * name-pair artifact (q72's Levenshtein-1 blocklist). Like
    * [[lineitemGraphFp]], columns outside the digest (balances,
    * addresses) never invalidate the pair list because they never
    * enter it; the digest sums row multiplicity, so any name
    * add/remove/change produces a new key. Own cacheTag: customer
    * could later carry a full-row fingerprint without collision. */
  def customerNameFp(s: SparkSession, dir: String): Long =
    fpOf(s, dir, "customer",
      queries.OpsQueries.checksumHash("customer_name", Seq("c_name")),
      cacheTag = "customer_name")

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
    val dataDir = publishOnce(s, key, fp) { tmp =>
      val w = build.withColumn("fp", lit(fp)).write
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*)
       else w)
        .mode("overwrite").parquet(tmp.resolve("data").toString)
    }
    s.read.parquet(dataDir)
  }

  /** The publication contract, factored from [[parquetOnce]] for
    * builders that lay out a generation themselves (the bucket-carried
    * delta path writes data + certificate + file manifest into ONE
    * staging dir so a single atomic rename publishes them together):
    * `write` fills the staging dir; this handles the build lock, the
    * manifest, the atomic rename, and the lost-race cleanup. Returns
    * the generation's `data` path. */
  private def publishOnce(s: SparkSession, key: String, fp: Long)
                         (write: Path => Unit): String = {
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
            // a FAILED build must not leak its staging tree (at corpus
            // scale a crashed carry's tmp dir is generation-sized);
            // the failure itself stays loud
            try write(tmp)
            catch {
              case e: Throwable =>
                try deleteRecursively(tmp) catch { case _: Throwable => () }
                throw e
            }
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
    s"$dirKey/data"
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

  /** The (doc_id, digest, src, bck) sidecar recording WHICH corpus a
    * generation was built from — the delta path's carry certificate,
    * hive-partitioned by the same `bck` as the data. The digest is
    * [[documentsRowDigest]], the SAME per-row hash the corpus
    * fingerprint sums, so it certifies every fingerprinted column
    * (doc_id, text, lang, source, n_chars) — a doc whose text survived
    * a re-crawl but whose source moved is rebuilt, keeping the carry
    * safe for any doc-local family, not just text-derived ones. `src`
    * names the corpus file that held the doc (the file-level carry's
    * join key); pre-r13 generations carry the (doc_id, digest)-only
    * form and delta through the row-level fallback. */
  private def docsSidecarPath(key: String, fp: Long): Path =
    Paths.get(root, key, s"fp-$fp", "docs")

  /** Per-generation corpus-file manifest (path, size, mtime, digest
    * sum) — [[fpOf]]'s cache format, pinned to the generation so the
    * NEXT build knows exactly which files it derived from. */
  private def filesManifestPath(key: String, fp: Long): Path =
    Paths.get(root, key, s"fp-$fp", "files")

  /** Doc-id bucket count for a delta generation's partition layout,
    * SCALED to the corpus: ~[[BucketTargetBytes]] of source corpus per
    * bucket, floor 8, cap 65536. A fixed count can't serve both ends —
    * 64 buckets over a megabyte corpus is 64 tiny files whose per-file
    * open/footer cost showed up as a flat 2–2.8× on every
    * artifact-served query at sf0.1 (measured, r13), while a large
    * corpus wants MORE buckets to keep the carry granularity fine and
    * bucket rewrites bounded. The count is a layout property OF EACH
    * GENERATION (recorded in its `buckets` note); a corpus that grows
    * across a threshold simply demotes the next build to the row-level
    * carry once and re-buckets. */
  private val BucketTargetBytes = 8L << 20

  /** POWER-OF-TWO quantized (r13 self-review finding 3): a plain
    * ceiling would move the count on every ~8 MB of corpus growth, and
    * every count change demotes the next build to the full row-level
    * rewrite — a TB-scale corpus would demote on EVERY append.
    * Quantized, re-bucketing happens only when the corpus DOUBLES:
    * amortized O(1) full rewrites over a corpus's lifetime. */
  private[graft] def bucketsFor(corpusBytes: Long): Int = {
    val raw = math.max(1L,
      (corpusBytes + BucketTargetBytes - 1) / BucketTargetBytes)
    val p2 = java.lang.Long.highestOneBit(raw)
    val rounded = if (p2 == raw) raw else p2 << 1
    math.max(8L, math.min(65536L, rounded)).toInt
  }

  private def bckCol(nb: Int): Column = pmod(col("doc_id"), lit(nb.toLong))

  /** The current corpus certificate over exactly `paths`:
    * (doc_id, digest, src, bck). */
  private def docCertFrame(s: SparkSession, paths: Seq[String],
                           nb: Int): DataFrame =
    s.read.parquet(paths: _*).select(col("doc_id"),
      documentsRowDigest.as("digest"),
      graft.sources.CorpusFiles.srcCol.as("src"),
      bckCol(nb).as("bck"))

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

  /** Bucket-carry observability (the r12 verdict item 1 "done"
    * criterion): per key, the last delta build's linked vs rewritten
    * bucket counts, linked vs written bytes, and the corpus files it
    * actually scanned. */
  case class CarryStat(linkedBuckets: Int, rewrittenBuckets: Int,
                       bytesLinked: Long, bytesWritten: Long,
                       scannedFiles: Seq[String])
  private[graft] val carryStats = new ConcurrentHashMap[String, CarryStat]()

  /** Hard-link (fall back to copy where the FS refuses links) every
    * data file of `src` into `dst`; returns bytes carried.
    * `skipMarkers` additionally skips `_`-prefixed files (_SUCCESS) —
    * for carries that link into a dir a fresh write already owns.
    * `requireFlat` fails LOUDLY on a subdirectory in `src` (r16
    * ADVICE): only top-level regular files are linked, so a carry
    * whose prior generation unexpectedly holds subdirectories (a
    * hand-compacted or hive-partitioned layout) would otherwise
    * silently carry zero of their bytes — the flat-dir callers assert
    * the invariant instead of presuming it. */
  private def linkDirInto(src: Path, dst: Path,
                          skipMarkers: Boolean = false,
                          requireFlat: Boolean = false): Long = {
    Files.createDirectories(dst)
    var bytes = 0L
    val kids = Files.list(src)
    try kids.forEach { f =>
      val n = f.getFileName.toString
      if (requireFlat && Files.isDirectory(f))
        throw new IllegalStateException(
          s"link carry expected a flat dir but $src holds subdirectory " +
            s"$n — its files would be silently dropped; refusing the carry")
      if (Files.isRegularFile(f) && !n.startsWith(".") &&
          !(skipMarkers && n.startsWith("_"))) {
        val t = dst.resolve(n)
        try Files.createLink(t, f)
        catch { case _: UnsupportedOperationException |
                     _: java.nio.file.FileSystemException =>
          Files.copy(f, t, StandardCopyOption.COPY_ATTRIBUTES)
        }
        bytes += Files.size(f)
      }
    } finally kids.close()
    bytes
  }

  /** Count of data part files in a served directory (regular,
    * non-hidden, non-marker) — the link-carry accretion metric the
    * pair stores' voluntary compaction thresholds on. */
  private def partFileCount(dir: Path): Int = {
    if (!Files.isDirectory(dir)) return 0
    var n = 0
    val kids = Files.list(dir)
    try kids.forEach { f =>
      val name = f.getFileName.toString
      if (Files.isRegularFile(f) && !name.startsWith(".") &&
          !name.startsWith("_")) n += 1
    } finally kids.close()
    n
  }

  private def dirBytes(p: Path): Long = {
    if (!Files.isDirectory(p)) return 0L
    var bytes = 0L
    val kids = Files.walk(p)
    try kids.forEach(f => if (Files.isRegularFile(f)) bytes += Files.size(f))
    finally kids.close()
    bytes
  }

  /** Write the generation's file manifest from per-file sums derived
    * off the certificate, carrying unchanged files' recorded sums; the
    * entries must re-sum to `fp` (a mismatch means the corpus mutated
    * mid-build — fail loud, never publish a mislabeled generation). */
  private def writeFilesManifest(s: SparkSession, tmp: Path, fp: Long,
                                 listing: Seq[(String, Long, Long)],
                                 carriedSums: Map[String, Long],
                                 freshCert: DataFrame): Unit = {
    val fs = new org.apache.hadoop.fs.Path(tmp.toString)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val freshSums = freshCert.groupBy(col("src"))
      .agg((sum(col("digest").cast(DecimalType(38, 0))) % lit(Mod))
        .cast(LongType).as("sum"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val unknown = freshSums.keySet -- listing.map(_._1).toSet
    require(unknown.isEmpty,
      s"certificate attributed rows to unlisted files $unknown")
    val entries = listing.map { case (p, sz, mt) =>
      (p, sz, mt, freshSums.getOrElse(p, carriedSums.getOrElse(p, 0L)))
    }
    require(entries.map(e => BigInt(e._4)).sum.mod(BigInt(Mod)).toLong == fp,
      s"generation manifest sums disagree with fp $fp — corpus changed " +
        "mid-build; refusing to publish a mislabeled generation")
    graft.sources.CorpusFiles.writeManifest(fs,
      new org.apache.hadoop.fs.Path(tmp.resolve("files").toString), entries)
  }

  /** [[writeFilesManifest]] plus the bucket-layout note the
    * doc-local delta families' dispatch consults. */
  private def writeGenManifest(s: SparkSession, tmp: Path, fp: Long, nb: Int,
                               listing: Seq[(String, Long, Long)],
                               carriedSums: Map[String, Long],
                               freshCert: DataFrame): Unit = {
    writeFilesManifest(s, tmp, fp, listing, carriedSums, freshCert)
    // record the generation's bucket LAYOUT alongside (r13 self-review
    // finding 1): the bucket-carry path mixes the prior sidecar's bck
    // values with freshly computed ones, which is only sound when both
    // used the same modulus — a modulus change against a same-modulus
    // assumption would link a changed doc's OLD bucket while writing
    // its fresh rows into the NEW one (silent duplication). The
    // dispatch below demotes a modulus-mismatched OR unrecorded prior
    // to the row-level carry.
    Files.writeString(tmp.resolve("buckets"), s"$nb\n")
  }

  /** The bucket modulus a generation was written with; None (no
    * `buckets` note — a generation from before the note existed) must
    * DEMOTE the carry, never be presumed current: the modulus is
    * corpus-scaled, so "current" is not even well-defined for it. */
  private def generationBuckets(key: String, fp: Long): Option[Int] = {
    val p = Paths.get(root, key, s"fp-$fp", "buckets")
    if (!Files.exists(p)) None
    else scala.util.Try(Files.readString(p).trim.toInt).toOption
  }

  /** [[documentsArtifact]] for CORPUS-LINEAR, DOC-LOCAL families
    * (every output row is a pure function of its own document's
    * content — shingle hashes, minhash signatures): generation N+1 is
    * built from generation N plus the document delta instead of
    * re-deriving the whole corpus (r11 verdict item 3 — at 100 TB you
    * cannot re-shingle the corpus because 1 GB arrived), and — r12
    * verdict item 1 — the carry is PARTITION-LEVEL: data and
    * certificate are hive-partitioned by `bck = doc_id mod
    * [[bucketsFor]]`, buckets untouched by the delta are HARD-LINKED
    * from the prior generation (metadata-priced, zero data I/O), and
    * the carry certificate derives from the prior generation's file
    * manifest plus a scan of ONLY the new/changed corpus files. Per
    * append the I/O is therefore O(delta files + touched buckets):
    *
    *  - file level: the prior generation's `files` manifest names the
    *    corpus files it derived from; files unchanged (path+size+mtime)
    *    contribute their certificate rows and digest sums verbatim,
    *    only new/changed files are scanned ([[graft.sources
    *    .CorpusFiles]]);
    *  - row level, within the scanned delta: docs whose (doc_id,
    *    digest) matches the prior certificate are carries (a
    *    compaction that re-files unchanged docs rebuilds nothing),
    *    the rest run `buildFor`; removed docs drop out;
    *  - bucket level: a bucket is rewritten only if a changed, new, or
    *    removed doc lands in it — everything else is a hard link. A
    *    bucket whose docs merely MOVED files relinks its data and
    *    rewrites only its certificate partition (src changed, rows
    *    didn't).
    *
    * Certificate, file manifest, and data publish in ONE staging dir →
    * one atomic rename (strictly stronger than the r12
    * ensure-after-publish self-healing). Prior generations without a
    * file manifest (pre-r13) delta through the row-level fallback and
    * come out in the new layout — one migration build, then steady
    * state. The PAIR-local families (brute_pair_stats_v1,
    * banded_cand_nmatch_v1, the pair stores) cannot ride this carry —
    * their rows name two documents — and instead append through
    * [[documentsPairArtifact]]'s pure-append algebra.
    *
    * **`fp` data-column caveat (r13 ADVICE, low):** hard-linked
    * untouched buckets are the PRIOR generation's bytes, so their rows
    * retain the prior generation's `fp` column value inside the
    * `fp-<new>` directory. For delta-carried families the DIRECTORY
    * name is the generation's identity; the `fp` column is not, and no
    * consumer may filter on it (none does: this read drops it, and no
    * oracle reads a delta-carried family's glob — the fp-filtered
    * oracle globs all target full-rebuild [[parquetOnce]] model-state
    * families, where the column is exact). Any future direct reader of
    * [[dataPath]] for these keys must drop `fp` the same way. */
  def documentsDeltaArtifact(s: SparkSession, dir: String, key: String)
                            (buildFor: DataFrame => DataFrame): DataFrame = {
    val fp = documentsFp(s, dir)
    val dataDir = publishOnce(s, key, fp) { tmp =>
      val listing = graft.sources.CorpusFiles.list(s, dir, "documents")
      val nb = bucketsFor(listing.map(_._2).sum)
      val hfs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val prior = priorGeneration(key, fp)
      val priorManifest = prior.flatMap { pfp =>
        graft.sources.CorpusFiles.readManifest(hfs,
          new org.apache.hadoop.fs.Path(filesManifestPath(key, pfp).toString))
      }
      (prior, priorManifest) match {
        case (Some(pfp), Some(pm))
          if generationBuckets(key, pfp).contains(nb) =>
          bucketCarryBuild(s, dir, key, fp, nb, tmp, pfp, pm, listing)(buildFor)
        case (Some(pfp), _) =>
          // pre-r13 prior (no manifest), a prior written under a
          // DIFFERENT bucket modulus (corpus crossed a sizing
          // threshold), or an unrecorded one: bucket dirs don't align,
          // so the carry demotes to row level — one migration build in
          // the new layout, then steady state
          rowCarryBuild(s, dir, key, fp, nb, tmp, pfp, listing)(buildFor)
        case _ =>
          fullBuild(s, dir, key, fp, nb, tmp, listing)(buildFor)
      }
    }
    s.read.parquet(dataDir).drop("fp").drop("bck")
  }

  /** One task per bucket before a bucketed write: without it every
    * shuffle partition writes a sliver into every bucket it holds —
    * up to tasks×buckets files per generation, and every consumer
    * query pays the per-file scan overhead forever. One bounded
    * shuffle at build time buys ≤1 file per bucket per build. */
  private def byBucket(df: DataFrame, nb: Int): DataFrame =
    df.repartition(nb, col("bck"))

  private def fullBuild(s: SparkSession, dir: String, key: String, fp: Long,
                        nb: Int, tmp: Path, listing: Seq[(String, Long, Long)])
                       (buildFor: DataFrame => DataFrame): Unit = {
    val cert = docCertFrame(s, listing.map(_._1), nb).localCheckpoint()
    byBucket(buildFor(Tables.documents(s, dir))
      .withColumn("bck", bckCol(nb)).withColumn("fp", lit(fp)), nb)
      .write.partitionBy("bck").mode("overwrite")
      .parquet(tmp.resolve("data").toString)
    byBucket(cert, nb).write.partitionBy("bck").mode("overwrite")
      .parquet(tmp.resolve("docs").toString)
    writeGenManifest(s, tmp, fp, nb, listing, Map.empty, cert)
    deltaStats.put(key, (-1L, -1L))
    carryStats.remove(key)
  }

  private def rowCarryBuild(s: SparkSession, dir: String, key: String,
                            fp: Long, nb: Int, tmp: Path, pfp: Long,
                            listing: Seq[(String, Long, Long)])
                           (buildFor: DataFrame => DataFrame): Unit = {
    val cert = docCertFrame(s, listing.map(_._1), nb).localCheckpoint()
    val priorKeys = s.read.parquet(docsSidecarPath(key, pfp).toString)
      .select(col("doc_id"), col("digest"))
    val (unchangedIds, changedIds, _) =
      deltaSplit(key, "doc_id", cert.select(col("doc_id"), col("digest")),
        priorKeys)
    val fresh = buildFor(
      Tables.documents(s, dir).join(changedIds, Seq("doc_id"), "left_semi"))
      .withColumn("bck", bckCol(nb)).withColumn("fp", lit(fp))
    val priorData = s.read.parquet(dataPath(key, pfp)).drop("fp")
    val carried = (if (priorData.columns.contains("bck"))
      priorData.drop("bck") else priorData)
      .join(unchangedIds, Seq("doc_id"), "left_semi")
      .withColumn("bck", bckCol(nb)).withColumn("fp", lit(fp))
    byBucket(fresh.unionByName(carried.select(fresh.columns.map(col): _*)), nb)
      .write.partitionBy("bck").mode("overwrite")
      .parquet(tmp.resolve("data").toString)
    byBucket(cert, nb).write.partitionBy("bck").mode("overwrite")
      .parquet(tmp.resolve("docs").toString)
    writeGenManifest(s, tmp, fp, nb, listing, Map.empty, cert)
    carryStats.remove(key)
  }

  private def bucketCarryBuild(s: SparkSession, dir: String, key: String,
                               fp: Long, nb: Int, tmp: Path, pfp: Long,
                               priorManifest: Map[String, (Long, Long, Long)],
                               listing: Seq[(String, Long, Long)])
                              (buildFor: DataFrame => DataFrame): Unit = {
    import scala.jdk.CollectionConverters._
    val (unchanged, delta) = listing.partition { case (p, sz, mt) =>
      priorManifest.get(p).exists { case (s0, m0, _) => s0 == sz && m0 == mt }
    }
    val removedOrChanged =
      (priorManifest.keySet -- unchanged.map(_._1)).toSeq.sorted
    val deltaPaths = delta.map(_._1)
    val priorSidecar = s.read.parquet(docsSidecarPath(key, pfp).toString)
      .select(col("doc_id"), col("digest"), col("src"),
        col("bck").cast(LongType).as("bck"))
    val deltaKeys =
      (if (deltaPaths.isEmpty) priorSidecar.limit(0)
       else docCertFrame(s, deltaPaths, nb)).localCheckpoint()
    // changed = scanned docs the prior certificate cannot vouch for;
    // a doc that merely moved files keeps its (doc_id, digest) pair
    val changedIds = deltaKeys
      .join(priorSidecar.select(col("doc_id"), col("digest")),
        Seq("doc_id", "digest"), "left_anti")
      .select(col("doc_id"), col("bck")).localCheckpoint()
    // removed = prior docs of vanished/changed files that did not
    // resurface in the scan AND are not also held by an unchanged file
    // (r13 ADVICE, low: a doc duplicated across a deleted file and an
    // unchanged one is still in the corpus — anti-joining it out of the
    // rebuilt bucket while the carried certificate keeps its
    // unchanged-src row would silently lose rows; reachable only when
    // doc_id is not unique across corpus files. Row MULTIPLICITY for
    // such duplicates still differs from a from-scratch build — the
    // carry keeps one copy where a full build re-derives per input row
    // — the documented residual of keying a carry on doc identity)
    val removedIds = priorSidecar
      .where(col("src").isin(removedOrChanged: _*))
      .join(deltaKeys.select(col("doc_id"), col("digest")),
        Seq("doc_id", "digest"), "left_anti")
      .join(priorSidecar.where(!col("src").isin(removedOrChanged: _*))
        .select(col("doc_id"), col("digest")),
        Seq("doc_id", "digest"), "left_anti")
      .select(col("doc_id"), col("bck")).localCheckpoint()
    def bcks(df: DataFrame): Set[Long] = df.select(col("bck")).distinct()
      .collect().map(_.getLong(0)).toSet
    val touchedData = bcks(changedIds) ++ bcks(removedIds)
    val touchedCert = touchedData ++ bcks(deltaKeys) // moved docs: new src
    // --- data: rebuild touched buckets, hard-link the rest
    val changedDocs =
      (if (deltaPaths.isEmpty) Tables.documents(s, dir).limit(0)
       else s.read.parquet(deltaPaths: _*))
        .join(changedIds.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val fresh = buildFor(changedDocs)
      .withColumn("bck", bckCol(nb)).withColumn("fp", lit(fp))
    val keepInTouched =
      (if (touchedData.isEmpty) fresh.limit(0)
       else {
         val p = s.read.parquet(dataPath(key, pfp)).drop("fp")
           .where(col("bck").isin(touchedData.toSeq: _*)) // partition prune
           .join(changedIds.select(col("doc_id")), Seq("doc_id"), "left_anti")
           .join(removedIds.select(col("doc_id")), Seq("doc_id"), "left_anti")
           .withColumn("bck", col("bck").cast(LongType))
           .withColumn("fp", lit(fp))
         p.select(fresh.columns.map(col): _*)
       })
    byBucket(fresh.unionByName(keepInTouched), nb)
      .write.partitionBy("bck").mode("overwrite")
      .parquet(tmp.resolve("data").toString)
    var linkedBytes = 0L
    var linked = 0
    val priorDataDir = Paths.get(dataPath(key, pfp))
    val kids = Files.list(priorDataDir)
    try kids.iterator().asScala.foreach { d =>
      val n = d.getFileName.toString
      if (n.startsWith("bck=") &&
          !touchedData(n.stripPrefix("bck=").toLong)) {
        linkedBytes += linkDirInto(d, tmp.resolve("data").resolve(n))
        linked += 1
      }
    } finally kids.close()
    // --- certificate: current corpus rows for touched buckets, links
    // for the rest (their docs all sit in unchanged files, or the
    // bucket would be touched)
    val certTouched = deltaKeys
      .where(col("bck").isin(touchedCert.toSeq: _*))
      .unionByName(priorSidecar
        .where(!col("src").isin(removedOrChanged: _*))
        .where(col("bck").isin(touchedCert.toSeq: _*)))
    byBucket(certTouched, nb).write.partitionBy("bck").mode("overwrite")
      .parquet(tmp.resolve("docs").toString)
    val priorDocsDir = docsSidecarPath(key, pfp)
    val dk = Files.list(priorDocsDir)
    try dk.iterator().asScala.foreach { d =>
      val n = d.getFileName.toString
      if (n.startsWith("bck=") && !touchedCert(n.stripPrefix("bck=").toLong))
        linkDirInto(d, tmp.resolve("docs").resolve(n))
    } finally dk.close()
    // --- manifest: carried sums for unchanged files, fresh sums for
    // the scanned delta
    val unchangedSet = unchanged.map(_._1).toSet
    writeGenManifest(s, tmp, fp, nb, listing,
      priorManifest.collect { case (p, (_, _, sum))
        if unchangedSet(p) => p -> sum },
      deltaKeys.select(col("src"), col("digest")))
    // --- stats: deltaStats keeps its (carried, rebuilt) meaning;
    // carryStats adds the bucket/byte pin
    val nChanged = changedIds.count()
    val nCur = deltaKeys.count() +
      priorSidecar.where(!col("src").isin(removedOrChanged: _*)).count()
    deltaStats.put(key, (nCur - nChanged, nChanged))
    carryStats.put(key, CarryStat(
      linkedBuckets = linked,
      rewrittenBuckets = touchedData.size,
      bytesLinked = linkedBytes,
      bytesWritten = dirBytes(tmp.resolve("data")) - linkedBytes,
      scannedFiles = deltaPaths))
  }

  // ------------------------------------------- vec cell-carried generations

  /** The embeddings-side twin of the docs sidecar: the (vec_id, digest,
    * src, cell) carry certificate, hive-partitioned by the SAME `cell`
    * as the data. */
  private def vecsSidecarPathOf(key: String, fp: Long): Path =
    Paths.get(root, key, s"fp-$fp", "vecs")

  /** Whether a generation's vecs certificate is cell-partitioned (the
    * r14 layout) — the cell-carry's eligibility check; flat pre-r14
    * sidecars demote to the row-level carry for one migration build. */
  private def vecsCellPartitioned(key: String, fp: Long): Boolean = {
    import scala.jdk.CollectionConverters._
    val p = vecsSidecarPathOf(key, fp)
    if (!Files.isDirectory(p)) return false
    val kids = Files.list(p)
    try kids.iterator().asScala.exists(
      _.getFileName.toString.startsWith("cell="))
    finally kids.close()
  }

  /** Tombstone-filtered (vec_id, digest, src) certificate over exactly
    * `paths` — [[embeddingsCarryDigest]] (order-sensitive), so a
    * component-swapped vector is never certified as unchanged. */
  private def vecCertFrame(s: SparkSession, dir: String,
                           paths: Seq[String]): DataFrame =
    s.read.parquet(paths: _*)
      .select(col("vec_id"), embeddingsCarryDigest.as("digest"),
        graft.sources.CorpusFiles.srcCol.as("src"))
      .join(broadcast(graft.sources.VecTakedown.tombstones(s, dir)),
        Seq("vec_id"), "left_anti")

  /** One task per cell before a cell-partitioned write (the byBucket
    * lesson): hash repartitioning never splits equal keys, so each cell
    * directory gets at most one file per writing task group instead of
    * tasks×cells slivers. */
  private def byCell(df: DataFrame): DataFrame = df.repartition(col("cell"))

  /** The generation's embeddings file manifest, copied from the global
    * fp cache (validated against the current listing by the
    * [[embeddingsFp]] call that keyed this build) and re-sum-guarded:
    * entries must re-sum to `corpusFp`, or the corpus mutated mid-build
    * and the generation would be mislabeled. */
  private def writeVecManifest(s: SparkSession, tmp: Path, dir: String,
                               corpusFp: Long,
                               listing: Seq[(String, Long, Long)]): Unit = {
    val hfs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val cache = graft.sources.CorpusFiles
      .readManifest(hfs, fpCachePath(dir, "embeddings"))
      .getOrElse(throw new IllegalStateException(
        s"no fp cache for $dir/embeddings — embeddingsFp must run first"))
    val entries = listing.map { case (p0, sz, mt) =>
      val (s0, m0, sum) = cache.getOrElse(p0, throw new IllegalStateException(
        s"corpus file $p0 missing from the fp cache — corpus changed " +
          "mid-build; refusing to publish a mislabeled generation"))
      require(s0 == sz && m0 == mt,
        s"corpus file $p0 changed mid-build; refusing a mislabeled generation")
      (p0, sz, mt, sum)
    }
    require(entries.map(e => BigInt(e._4)).sum.mod(BigInt(Mod)).toLong ==
      corpusFp,
      s"generation manifest sums disagree with corpus fp $corpusFp — " +
        "corpus changed mid-build; refusing a mislabeled generation")
    graft.sources.CorpusFiles.writeManifest(hfs,
      new org.apache.hadoop.fs.Path(tmp.resolve("files").toString), entries)
  }

  /** CELL-PARTITIONED, partition-carried generations for VEC-LOCAL
    * embedding-derived families — the serve cells and the residual-PQ
    * code index (r13 verdict item 1, the top_next): every output row is
    * a pure function of its own vector GIVEN the frozen books, so a
    * corpus append under kept books must cost O(delta vectors + touched
    * cells), not a full carried-row + certificate rewrite. The docs-side
    * [[documentsDeltaArtifact]] carry applied to the embeddings table,
    * with `cell` (the coarse assignment — already the data's partition
    * key for serve-side pruning) as the carry partition:
    *
    *  - file level: the generation's `files` manifest names the
    *    embeddings files it derived from; unchanged files are never
    *    scanned (the fingerprint itself is file-incremental via
    *    [[fpOf]]'s cache);
    *  - row level: scanned vectors whose (vec_id, order-sensitive
    *    digest) matches the prior certificate are carries; the rest
    *    re-encode (the expensive per-row derive — the IVFADC argmin —
    *    runs over the delta only);
    *  - cell level: a cell is rewritten only when a changed/new vector
    *    lands in it, a removed/changed vector must leave it, or its
    *    data row count disagrees with its certificate (rows GROWN by
    *    the ingest stream — [[graft.streaming.StreamAnnCells]] — are
    *    uncertified and are re-derived when ops appends them to the
    *    corpus, never carried: full-build equality holds). Every other
    *    cell is a HARD LINK — metadata-priced.
    *
    * Data, certificate ((vec_id, digest, src, cell), cell-partitioned
    * and itself partition-carried), file manifest, `corpus` note, and
    * the family's book notes publish in ONE staging dir → one atomic
    * rename. Rows carry NO `fp`/`corpus_fp` columns in this layout —
    * the directory name and the `corpus` note are the generation's
    * identity (the hard-linked files of a carried generation would
    * otherwise disagree with it — the documented fp-column caveat made
    * structural). Prior generations in the flat pre-r14 layout demote
    * to a row-level carry for one migration build; no prior builds
    * full. `prior` must be the newest generation under the SAME books
    * (the caller's digest match) — carrying across books would mix
    * incommensurable cells.
    *
    * `encode` maps raw embeddings rows to output rows and MUST be
    * row-local given the books, emit a long `cell` column, and keep
    * `vec_id`. */
  private[graft] def embeddingsCellArtifact(
      s: SparkSession, dir: String, key: String, fp: Long,
      prior: => Option[Long],
      encode: DataFrame => DataFrame,
      notes: Path => Unit): String = {
    val corpusFp = embeddingsFp(s, dir)
    publishOnce(s, key, fp) { tmp =>
      val listing = graft.sources.CorpusFiles.list(s, dir, "embeddings")
      val hfs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val p = prior
      val priorManifest = p.flatMap { pfp =>
        graft.sources.CorpusFiles.readManifest(hfs,
          new org.apache.hadoop.fs.Path(
            filesManifestPath(key, pfp).toString))
      }
      (p, priorManifest) match {
        case (Some(pfp), Some(pm)) if vecsCellPartitioned(key, pfp) =>
          // under the PRIOR generation's mutation lease: the carry
          // hard-links and count-compares the prior's live files, and
          // (a) an ingest-stream merge rewriting a cell mid-carry could
          // slip uncertified rows past the dirty-cell detection into a
          // linked cell, (b) a takedown scrub mid-carry could erase the
          // prior while our links pin the pre-scrub bytes into a
          // generation the scrub cannot see (not yet published). The
          // lease fails the late-comer loudly; an erasure pass re-runs
          // after the publish and then enumerates the new generation.
          graft.sources.MutationLease.withLease(s, dataPath(key, pfp)) {
            vecCellCarryBuild(s, dir, key, fp, corpusFp, tmp, pfp, pm,
              listing)(encode)
          }
        case (Some(pfp), _) =>
          vecRowCarryBuild(s, dir, key, fp, corpusFp, tmp, pfp,
            listing)(encode)
        case _ =>
          vecFullBuild(s, dir, key, fp, corpusFp, tmp, listing)(encode)
      }
      notes(tmp)
      Files.writeString(tmp.resolve("corpus"), s"$corpusFp\n")
    }
  }

  /** The generation's corpus fingerprint: the r14 `corpus` note when
    * present, else the legacy `corpus_fp` data column (one footer-cheap
    * row) — the corpus-scoped enumerators' read. */
  private[graft] def generationCorpusFp(s: SparkSession, key: String,
                                        fp: Long): Option[Long] = {
    val note = Paths.get(root, key, s"fp-$fp", "corpus")
    if (Files.exists(note))
      scala.util.Try(Files.readString(note).trim.toLong).toOption
    else scala.util.Try(
      s.read.parquet(dataPath(key, fp)).select(col("corpus_fp")).limit(1)
        .collect().headOption.map(_.getLong(0))).toOption.flatten
  }

  private def vecFullBuild(s: SparkSession, dir: String, key: String,
                           fp: Long, corpusFp: Long, tmp: Path,
                           listing: Seq[(String, Long, Long)])
                          (encode: DataFrame => DataFrame): Unit = {
    val served = graft.sources.VecTakedown.servedEmbeddings(s, dir)
    byCell(encode(served)).write.partitionBy("cell").mode("overwrite")
      .parquet(tmp.resolve("data").toString)
    // cert cells come off the WRITTEN data (column-pruned read-back),
    // so the expensive encode runs exactly once
    val written = s.read.parquet(tmp.resolve("data").toString)
      .select(col("vec_id"), col("cell").cast(LongType).as("cell"))
    val cert = vecCertFrame(s, dir, listing.map(_._1))
      .join(written, Seq("vec_id"))
    byCell(cert).write.partitionBy("cell").mode("overwrite")
      .parquet(tmp.resolve("vecs").toString)
    writeVecManifest(s, tmp, dir, corpusFp, listing)
    deltaStats.put(key, (-1L, -1L))
    carryStats.remove(key)
  }

  /** The migration build: a prior with a flat (vec_id, digest)
    * certificate carries at row level once and comes out in the
    * cell-partitioned layout. */
  private def vecRowCarryBuild(s: SparkSession, dir: String, key: String,
                               fp: Long, corpusFp: Long, tmp: Path,
                               pfp: Long, listing: Seq[(String, Long, Long)])
                              (encode: DataFrame => DataFrame): Unit = {
    val served = graft.sources.VecTakedown.servedEmbeddings(s, dir)
    val curKeys = vecCertFrame(s, dir, listing.map(_._1)).localCheckpoint()
    val priorKeys = s.read.parquet(vecsSidecarPathOf(key, pfp).toString)
      .select(col("vec_id"), col("digest"))
    val (unchangedIds, changedIds, _) = deltaSplit(key, "vec_id",
      curKeys.select(col("vec_id"), col("digest")), priorKeys)
    val fresh = encode(served.join(changedIds, Seq("vec_id"), "left_semi"))
    val carried = s.read.parquet(dataPath(key, pfp))
      .drop("fp").drop("corpus_fp")
      .join(unchangedIds, Seq("vec_id"), "left_semi")
      .withColumn("cell", col("cell").cast(LongType))
    byCell(fresh.unionByName(carried.select(fresh.columns.map(col): _*)))
      .write.partitionBy("cell").mode("overwrite")
      .parquet(tmp.resolve("data").toString)
    val written = s.read.parquet(tmp.resolve("data").toString)
      .select(col("vec_id"), col("cell").cast(LongType).as("cell"))
    byCell(curKeys.join(written, Seq("vec_id")))
      .write.partitionBy("cell").mode("overwrite")
      .parquet(tmp.resolve("vecs").toString)
    writeVecManifest(s, tmp, dir, corpusFp, listing)
    carryStats.remove(key)
  }

  private def vecCellCarryBuild(s: SparkSession, dir: String, key: String,
                                fp: Long, corpusFp: Long, tmp: Path,
                                pfp: Long,
                                priorManifest: Map[String, (Long, Long, Long)],
                                listing: Seq[(String, Long, Long)])
                               (encode: DataFrame => DataFrame): Unit = {
    import scala.jdk.CollectionConverters._
    val (unchanged, delta) = listing.partition { case (p0, sz, mt) =>
      priorManifest.get(p0).exists { case (s0, m0, _) => s0 == sz && m0 == mt }
    }
    val removedOrChanged =
      (priorManifest.keySet -- unchanged.map(_._1)).toSeq.sorted
    val deltaPaths = delta.map(_._1)
    val priorCert = s.read.parquet(vecsSidecarPathOf(key, pfp).toString)
      .select(col("vec_id"), col("digest"), col("src"),
        col("cell").cast(LongType).as("cell"))
    val deltaCert =
      (if (deltaPaths.isEmpty)
        priorCert.select(col("vec_id"), col("digest"), col("src")).limit(0)
       else vecCertFrame(s, dir, deltaPaths)).localCheckpoint()
    // changed/new = scanned vectors the prior certificate cannot vouch for
    val changedIds = deltaCert
      .join(priorCert.select(col("vec_id"), col("digest")),
        Seq("vec_id", "digest"), "left_anti")
      .select(col("vec_id")).localCheckpoint()
    // removed = prior vecs of vanished/changed files that did not
    // resurface and are not also held by an unchanged file (the docs-side
    // duplicate fix mirrored); includes CHANGED vecs' old rows — their
    // old cell may differ from the new assignment and must rewrite
    val removed = priorCert
      .where(col("src").isin(removedOrChanged: _*))
      .join(deltaCert.select(col("vec_id"), col("digest")),
        Seq("vec_id", "digest"), "left_anti")
      .join(priorCert.where(!col("src").isin(removedOrChanged: _*))
        .select(col("vec_id"), col("digest")),
        Seq("vec_id", "digest"), "left_anti")
      .select(col("vec_id"), col("cell")).localCheckpoint()
    // moved = same (vec_id, digest), new file: the cert row rewrites
    // with the live src (future removal detection keys on it); the
    // DATA row is untouched (same vector, same cell). Ids that ALSO
    // appear with a changed digest (same vec_id, different vectors
    // across delta files — a violation of the immutable-id contract)
    // are excluded: the fresh row wins whole, or the certificate would
    // hold contradictory digests for one id and a later revert could
    // carry the wrong bytes
    val moved = deltaCert
      .join(priorCert.select(col("vec_id"), col("digest"), col("cell")),
        Seq("vec_id", "digest"))
      .join(changedIds, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("digest"), col("src"), col("cell"))
      .dropDuplicates(Seq("vec_id", "digest"))
      .localCheckpoint()
    // fresh assignments: the expensive encode over the changed rows only
    val fresh = (
      if (deltaPaths.isEmpty)
        encode(Tables.embeddings(s, dir).limit(0))
      else encode(s.read.parquet(deltaPaths: _*)
        .join(changedIds, Seq("vec_id"), "left_semi"))
      ).localCheckpoint()
    def cellsOf(df: DataFrame): Set[Long] = df.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSet
    // dirty = cells whose data row count disagrees with the certificate:
    // stream-grown (uncertified) rows live there — rebuild so the delta
    // generation equals a from-scratch build (streamed rows re-derive
    // when ops appends them to the corpus; they are never carried)
    val priorDataPath = dataPath(key, pfp)
    val dataCounts = s.read.parquet(priorDataPath)
      .groupBy(col("cell").cast(LongType).as("cell")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val certCounts = priorCert.groupBy(col("cell")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dirty = (dataCounts.keySet ++ certCounts.keySet).filter(c =>
      dataCounts.getOrElse(c, 0L) != certCounts.getOrElse(c, 0L))
    val touchedData = cellsOf(fresh) ++ cellsOf(
      removed.select(col("cell"))) ++ dirty
    val touchedCert = touchedData ++ cellsOf(moved.select(col("cell")))
    // --- data: rebuild touched cells (fresh + certified survivors),
    // hard-link the rest
    val keptIds = priorCert
      .where(col("cell").isin(touchedData.toSeq: _*))
      .join(changedIds, Seq("vec_id"), "left_anti")
      .join(removed.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .select(col("vec_id"))
    val keptData =
      (if (touchedData.isEmpty) fresh.limit(0)
       else s.read.parquet(priorDataPath)
         .where(col("cell").isin(touchedData.toSeq: _*)) // partition prune
         .drop("fp").drop("corpus_fp")
         .join(keptIds, Seq("vec_id"), "left_semi")
         .withColumn("cell", col("cell").cast(LongType))
         .select(fresh.columns.map(col): _*))
    byCell(fresh.unionByName(keptData))
      .write.partitionBy("cell").mode("overwrite")
      .parquet(tmp.resolve("data").toString)
    var linkedBytes = 0L
    var linked = 0
    val dk = Files.list(Paths.get(priorDataPath))
    try dk.iterator().asScala.foreach { d =>
      val n = d.getFileName.toString
      if (n.startsWith("cell=") &&
          !touchedData(n.stripPrefix("cell=").toLong)) {
        linkedBytes += linkDirInto(d, tmp.resolve("data").resolve(n))
        linked += 1
      }
    } finally dk.close()
    // --- certificate: fresh + moved + certified survivors in touched
    // cells; links for the rest
    val keptCert = priorCert
      .where(col("cell").isin(touchedCert.toSeq: _*))
      .join(changedIds, Seq("vec_id"), "left_anti")
      .join(removed.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .join(moved.select(col("vec_id")), Seq("vec_id"), "left_anti")
    val freshCert = deltaCert
      .join(changedIds, Seq("vec_id"), "left_semi")
      .join(fresh.select(col("vec_id"), col("cell")), Seq("vec_id"))
      .select(col("vec_id"), col("digest"), col("src"), col("cell"))
    byCell(freshCert.unionByName(moved)
        .unionByName(keptCert.select(freshCert.columns.map(col): _*)))
      .write.partitionBy("cell").mode("overwrite")
      .parquet(tmp.resolve("vecs").toString)
    val ck = Files.list(vecsSidecarPathOf(key, pfp))
    try ck.iterator().asScala.foreach { d =>
      val n = d.getFileName.toString
      if (n.startsWith("cell=") && !touchedCert(n.stripPrefix("cell=").toLong))
        linkDirInto(d, tmp.resolve("vecs").resolve(n))
    } finally ck.close()
    writeVecManifest(s, tmp, dir, corpusFp, listing)
    val nChanged = changedIds.count()
    deltaStats.put(key, (priorCert.count() - removed.count(), nChanged))
    carryStats.put(key, CarryStat(
      linkedBuckets = linked,
      rewrittenBuckets = touchedData.size,
      bytesLinked = linkedBytes,
      bytesWritten = dirBytes(tmp.resolve("data")) - linkedBytes,
      scannedFiles = deltaPaths))
  }

  // ------------------------------------------------------ pair generations

  /** Observability for the last pair-store build per key: the build
    * mode ("full" | "delta" | "purge" | "purge+delta" | "compact"),
    * how many NEW docs the delta arm paired, which corpus files the
    * build scanned — the rows/bytes-processed pin for "an append
    * pairs only the delta" and "a removal scans only the delta"
    * (PairDeltaSpec) — and, on the purge modes, how many dead
    * (removed or in-place-changed) docs the purge anti-joined out. */
  case class PairBuildStat(mode: String, newDocs: Long,
                           scannedFiles: Seq[String],
                           certLinked: Boolean = false,
                           dataLinked: Boolean = false,
                           deadDocs: Long = -1L)

  /** Part-file count past which an appendOnly pair store's next PURE
    * APPEND compacts (full rebuild) instead of link-carrying (r16
    * verdict item 3): every link-carried append accretes one part-file
    * set in the served dir, and an unbounded chain degrades scan
    * parallelism / small-file behavior long before any demotion
    * compacts it. 64 ≈ two tasks per local[32] core of pure file
    * overhead — far below harm, far above any realistic same-corpus
    * append cadence between natural compactions. Var, not val: specs
    * lower it to pin the trigger without writing 64 generations. */
  private[graft] var pairCompactFileBound: Int = 64
  private[graft] val pairStats = new ConcurrentHashMap[String, PairBuildStat]()

  /** The current corpus certificate over exactly `paths`, flat
    * (no bucket column — pair generations are not partition-carried). */
  private def docCertFlat(s: SparkSession, paths: Seq[String]): DataFrame =
    s.read.parquet(paths: _*).select(col("doc_id"),
      documentsRowDigest.as("digest"),
      graft.sources.CorpusFiles.srcCol.as("src"))

  /** [[documentsArtifact]] for PAIR-LOCAL families (near-dup pair
    * lists, winnow match reports, sim-join results): rows name TWO
    * documents, so the doc-local delta carry's contract does not hold —
    * an appended doc changes rows it never appears in only through
    * global side state (a df cap), and a REMOVED or CHANGED doc
    * invalidates every pair it sat in. The scale observation (r15
    * verdict item 1): under a PURE APPEND the old-old pairs are
    * derivable from the prior generation (most carry verbatim; a
    * family with a df cap evicts/decrements the pairs whose support
    * crossed it), and the only new pairs involve a delta doc — so the
    * pairing join, the build's quadratic-shaped stage, runs at
    * O(delta × df-capped postings), never O(corpus²-collisions).
    *
    * Mechanics: the generation carries a flat (doc_id, digest, src)
    * certificate and a corpus-file manifest (the doc-local families'
    * discipline, minus bucketing). A build with a prior generation
    * scans ONLY the new/changed corpus files, splits the scanned rows
    * against the prior certificate, and classifies:
    *
    *  - pure append (no changed ids, no removals): `deltaFor(priorPairs,
    *    newIds)` produces the new pair set — the family's incremental
    *    algebra; the from-scratch `full` thunk never runs;
    *  - removal / in-place change under `appendOnly` (r16 verdict item
    *    1): every stored row is an exact pair-local truth keyed by its
    *    two doc ids — global side state (the df-based rare-first
    *    order, band layout) only shapes candidate GENERATION, never a
    *    verified row's value — so a removal is an anti-join PURGE
    *    (pairs touching a dead doc die; no other pair changes) and an
    *    in-place change is purge + the append algebra with the changed
    *    ids riding `newIds` (their doc-local store rows already hold
    *    the new content). Corpus I/O stays O(delta files): the purge
    *    reads the prior PAIR store (linear in stored pairs, and the
    *    rewrite doubles as a compaction), never re-pairs the corpus;
    *  - anything else (a non-appendOnly family's removal/change, or a
    *    MAJORITY-dead change set — see the inline cost guard):
    *    demote to `full`, once, like the pre-delta posture — winnow's
    *    df cap EVICTS pairs when support crosses it, and an eviction
    *    is not invertible from the stored rows (the evicted pair's
    *    per-hash support is gone), so its removals must re-derive.
    *
    * Exact-duplicate re-files (same doc_id+digest appearing in a new
    * file while the original row remains) carry as matched rows — row
    * MULTIPLICITY is invisible to every pair family (their feeds are
    * per-doc distinct), the documented residual shared with the
    * bucket carry. Certificate, manifest, and data publish in ONE
    * staging dir → one atomic rename.
    *
    * `appendOnly = true` declares the family's delta PURE-UNION: an
    * append never changes or removes a prior pair row (true for the
    * families whose rows are pure pair functions of append-invariant
    * per-doc state — minhash/brute/banded/simjoin; NOT for winnow,
    * whose df cap evicts/decrements). Under it `deltaFor` returns
    * ONLY the fresh rows and the prior generation's data files
    * HARD-LINK beside them — O(delta) data maintenance, the cert
    * carry's discipline applied to the pairs themselves. Linked files
    * retain the prior generation's `fp` column value inside the new
    * directory — the delta-carried families' documented caveat: the
    * DIRECTORY is the generation's identity, this read drops `fp`,
    * and no oracle reads these globs. A long append chain accretes
    * one part file per generation in the served dir (the standard
    * link-carry tradeoff); any purge or removal rewrite compacts it as
    * a side effect, and a pure-append chain that crosses
    * [[pairCompactFileBound]] part files triggers one voluntary
    * compacting full build (mode "compact") so the tail stays bounded
    * without waiting for a janitor (gcKeepLatest still reclaims old
    * generations' dirs without touching linked inodes).
    *
    * `pairCols` names the two doc-id columns of the family's rows —
    * the purge's anti-join keys (banded stores pairs as (da, db)). */
  def documentsPairArtifact(s: SparkSession, dir: String, key: String,
                            appendOnly: Boolean = false,
                            pairCols: (String, String) = ("doc_a", "doc_b"))
                           (full: => DataFrame)
                           (deltaFor: (DataFrame, DataFrame) => DataFrame)
      : DataFrame = {
    val fp = documentsFp(s, dir)
    val dataDir = publishOnce(s, key, fp) { tmp =>
      val listing = graft.sources.CorpusFiles.list(s, dir, "documents")
      val hfs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val prior = priorGeneration(key, fp)
      val priorManifest = prior.flatMap { pfp =>
        graft.sources.CorpusFiles.readManifest(hfs,
          new org.apache.hadoop.fs.Path(filesManifestPath(key, pfp).toString))
      }
      def fullBuild(mode: String = "full"): Unit = {
        val cert = docCertFlat(s, listing.map(_._1)).localCheckpoint()
        full.withColumn("fp", lit(fp)).write.mode("overwrite")
          .parquet(tmp.resolve("data").toString)
        cert.write.mode("overwrite").parquet(tmp.resolve("docs").toString)
        writeFilesManifest(s, tmp, fp, listing, Map.empty, cert)
        pairStats.put(key, PairBuildStat(mode, -1L, listing.map(_._1)))
      }
      (prior, priorManifest) match {
        case (Some(pfp), Some(pm)) =>
          val (unchanged, delta) = listing.partition { case (p, sz, mt) =>
            pm.get(p).exists { case (s0, m0, _) => s0 == sz && m0 == mt }
          }
          val removedOrChanged =
            (pm.keySet -- unchanged.map(_._1)).toSeq.sorted
          val deltaPaths = delta.map(_._1)
          val priorCert = s.read.parquet(docsSidecarPath(key, pfp).toString)
            .select(col("doc_id"), col("digest"), col("src"))
          val carriedCert = priorCert
            .where(!col("src").isin(removedOrChanged: _*))
          val deltaCert =
            (if (deltaPaths.isEmpty) priorCert.limit(0)
             else docCertFlat(s, deltaPaths)).localCheckpoint()
          // rows the prior certificate cannot vouch for
          val unvouched = deltaCert
            .join(priorCert.select(col("doc_id"), col("digest")),
              Seq("doc_id", "digest"), "left_anti").localCheckpoint()
          // changed = unvouched rows whose id the prior corpus knew
          val changedIds = unvouched
            .join(priorCert.select(col("doc_id")), Seq("doc_id"), "left_semi")
            .select(col("doc_id")).distinct().localCheckpoint()
          val nChanged = changedIds.count()
          // removed = prior rows of vanished/changed files that neither
          // resurfaced in the scan nor survive in an unchanged file
          val removedIds = priorCert
            .where(col("src").isin(removedOrChanged: _*))
            .join(deltaCert.select(col("doc_id"), col("digest")),
              Seq("doc_id", "digest"), "left_anti")
            .join(carriedCert.select(col("doc_id"), col("digest")),
              Seq("doc_id", "digest"), "left_anti")
            .select(col("doc_id")).distinct().localCheckpoint()
          val nRemoved = removedIds.count()
          val priorDataDir = Paths.get(dataPath(key, pfp))
          // the purge modes and the full build rewrite everything, so
          // the accretion check gates only the link-carried pure append
          val wantCompact = appendOnly &&
            partFileCount(priorDataDir) >= pairCompactFileBound
          def writeDeltaManifest(): Unit = {
            val unchangedSet = unchanged.map(_._1).toSet
            writeFilesManifest(s, tmp, fp, listing,
              pm.collect { case (p, (_, _, sum)) if unchangedSet(p) =>
                p -> sum },
              deltaCert.select(col("src"), col("digest")))
          }
          def writeCertAndManifest(): Unit = {
            carriedCert.unionByName(deltaCert)
              .write.mode("overwrite").parquet(tmp.resolve("docs").toString)
            writeDeltaManifest()
          }
          if (nChanged == 0L && nRemoved == 0L && !wantCompact) {
            val newIds = unvouched.select(col("doc_id")).distinct()
            val priorPairs = s.read.parquet(dataPath(key, pfp)).drop("fp")
            deltaFor(priorPairs, newIds).withColumn("fp", lit(fp))
              .write.mode("overwrite").parquet(tmp.resolve("data").toString)
            // pure-union families: fresh rows were written above; the
            // prior generation's pair rows carry as hard links. The
            // carry asserts the flat-dir invariant (r16 ADVICE): a
            // subdirectory in the prior data dir would silently drop
            // every old-old pair row, so it fails the build instead.
            if (appendOnly)
              linkDirInto(priorDataDir, tmp.resolve("data"),
                skipMarkers = true, requireFlat = true)
            // certificate: when no prior file vanished/changed, the new
            // cert is exactly prior ∪ delta — write the delta's rows
            // and HARD-LINK the prior generation's cert files beside
            // them (part names carry per-job UUIDs, so they never
            // collide), keeping cert maintenance O(delta) like the
            // manifest; a file-level change writes the full union once
            val linkCert = removedOrChanged.isEmpty
            if (linkCert) {
              deltaCert.write.mode("overwrite")
                .parquet(tmp.resolve("docs").toString)
              linkDirInto(docsSidecarPath(key, pfp),
                tmp.resolve("docs"), skipMarkers = true, requireFlat = true)
              writeDeltaManifest()
            } else writeCertAndManifest()
            pairStats.put(key,
              PairBuildStat("delta", newIds.count(), deltaPaths, linkCert,
                dataLinked = appendOnly))
          } else if (appendOnly && (nChanged > 0L || nRemoved > 0L) && {
            // PURGE only when the dead set is a sliver of the prior
            // corpus (the takedown shape). When MOST prior docs are
            // dead — the degenerate case being a prior generation of
            // the same key built from an UNRELATED corpus directory
            // sharing the store — the anti-join would scan the prior
            // pairs only to discard nearly all of them and then
            // delta-pair nearly the whole corpus: strictly worse than
            // the from-scratch build it exists to avoid. Majority-dead
            // demotes to full (one slim distinct-count against the
            // certificate decides).
            val nPriorDocs =
              priorCert.select(col("doc_id")).distinct().count()
            (nChanged + nRemoved) * 2 <= nPriorDocs
          }) {
            // PURGE (r16 verdict item 1): rows are exact pair-local
            // truths keyed by (a, b) — pairs touching a removed or
            // changed doc die by anti-join (both sides), nothing else
            // moves; changed and brand-new docs then ride the append
            // algebra (their doc-local stores already hold current
            // content). Corpus scan stays O(delta files); the prior
            // PAIR store is read once, linearly, and its rewrite
            // compacts the link-carried tail as a side effect.
            val (aCol, bCol) = pairCols
            val deadIds = changedIds.unionByName(removedIds).distinct()
              .localCheckpoint()
            val nDead = deadIds.count()
            val priorPairs = s.read.parquet(dataPath(key, pfp)).drop("fp")
            val purged = priorPairs
              .join(deadIds.withColumnRenamed("doc_id", aCol),
                Seq(aCol), "left_anti")
              .join(deadIds.withColumnRenamed("doc_id", bCol),
                Seq(bCol), "left_anti")
              .select(priorPairs.columns.map(col): _*)
            val freshIds = unvouched.select(col("doc_id")).distinct()
            val nFresh = freshIds.count()
            val out =
              if (nFresh == 0L) purged
              else purged.unionByName(
                deltaFor(purged, freshIds).select(purged.columns.map(col): _*))
            out.withColumn("fp", lit(fp)).write.mode("overwrite")
              .parquet(tmp.resolve("data").toString)
            writeCertAndManifest()
            pairStats.put(key, PairBuildStat(
              if (nFresh == 0L) "purge" else "purge+delta",
              nFresh, deltaPaths, deadDocs = nDead))
          } else fullBuild(if (wantCompact) "compact" else "full")
        case _ => fullBuild()
      }
    }
    s.read.parquet(dataDir).drop("fp")
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
