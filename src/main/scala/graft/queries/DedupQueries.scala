package graft.queries

import graft.Tables
import graft.llm.Dedup
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deduplication over `documents` (training-data curation surface):
  * exact digest dedup, brute n-gram Jaccard, MinHash signatures,
  * MinHash+LSH verified near-dups, SimHash fingerprints, SimHash banded
  * near-dups. All md5-based and exact-oracle-able (graft.llm.Dedup).
  */
object DedupQueries {

  /** q24 — exact dedup: group by 128-bit digest, keep the smallest doc_id.
    * At scale the shuffle key is the digest, never the document body. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("digest"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
      .select(col("doc_id"), col("dup_cnt"))
      .orderBy(col("doc_id"))

  /** The corpus's hashed word-3-gram shingle sets
    * (`shingle_hashes3_v1`, documents fingerprint): one row per
    * distinct (doc, shingle), carrying the only two hashes the engine
    * ever derives from a shingle — x (the minhash 60-bit md5 prefix)
    * and the 8-byte xxhash64 join key — computed once per CORPUS. The
    * endpoint of the hash-once discipline: the sig artifact aggregates
    * x from it, the pair-facts artifact joins h from it, q27's
    * verification and q177's df table read h from it; no registered
    * query md5s or xxhashes a 3-gram shingle anymore. Its h-projection
    * is exactly the shingle store [[graft.streaming.StreamDupEdges]]
    * maintains live. In the takedown cascade like every
    * documents-derived key. DELTA-GENERATIONAL (r11 verdict item 3):
    * the per-doc shingle rows are doc-local, so a corpus append
    * re-shingles only the appended docs and carries the rest from the
    * prior generation ([[graft.ArtifactStore.documentsDeltaArtifact]]). */
  private[graft] def shingleHashes3(s: SparkSession, dir: String): DataFrame =
    graft.ArtifactStore.documentsDeltaArtifact(s, dir, "shingle_hashes3_v1")(
      docs => Dedup.shingles(docs, 3)
        .select(col("doc_id"), Dedup.minhashTokenX(col("s")).as("x"),
          xxhash64(col("s")).as("h")))

  /** The 8-GRAM twin (`shingle_hashes8_v1`): distinct (doc_id, h)
    * over word-8-gram shingles — the span-sized gram family's
    * hash-once state. q96's containment and q139's split-leakage
    * audit both read it instead of re-exploding the corpus per query
    * (q76 keeps its inline shingling by necessity: it shingles an
    * AUGMENTED corpus with planted contamination, not the raw table).
    * No minhash x column — this family never signs, it only joins on
    * the 8-byte key. In the takedown cascade. Delta-generational like
    * its 3-gram twin. */
  private[graft] def shingleHashes8(s: SparkSession, dir: String): DataFrame =
    graft.ArtifactStore.documentsDeltaArtifact(s, dir, "shingle_hashes8_v1")(
      docs => Dedup.shingles(docs, 8)
        .select(col("doc_id"), xxhash64(col("s")).as("h")))

  /** The brute TRUTH FACTS every dedup audit re-derived per query:
    * for EVERY co-shingled document pair, the exact overlap count and
    * both shingle-set sizes — (doc_a, doc_b, c, na, nb), everything
    * any Jaccard-threshold decision needs, stored once per corpus
    * (`brute_pair_stats_v1`, documents fingerprint — the
    * verdict_flags_v1 pattern applied to the audits' shared arm).
    * q25 serves the ≥ 0.5 pairs from it, q142's exact leg and q182's
    * truth set filter it, q175's overlap lookup left-joins it; the
    * inverted shingle join (bounded by Σ_shingle count², the audits'
    * intrinsic cost) runs once per corpus instead of once per audit.
    * Invalidated by the takedown cascade like every documents-derived
    * family; DuckDB oracles recompute from the corpus, unchanged. */
  private[graft] def brutePairStats(s: SparkSession, dir: String): DataFrame =
    graft.ArtifactStore.documentsPairArtifact(s, dir, "brute_pair_stats_v1",
      appendOnly = true)(
      brutePairStatsDirect(s, dir))(
      brutePairStatsDelta(s, dir))

  /** The from-scratch pair-facts pipeline (the full-build thunk and
    * the delta spec's reference arm). */
  private[graft] def brutePairStatsDirect(s: SparkSession,
                                          dir: String): DataFrame = {
    // 8-byte keys off the shingle-hash artifact — the build
    // re-hashes nothing (nested artifact builds are supported)
    val sh = shingleHashes3(s, dir).select(col("doc_id"), col("h"))
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    sh.as("a")
      .join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
      .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("c"),
        col("sa.n").as("na"), col("sb.n").as("nb"))
  }

  /** The append-incremental pair-facts algebra: (c, na, nb) is a pure
    * function of each pair's two shingle sets, which an append never
    * touches for old docs — prior rows carry verbatim, and the
    * inverted join runs over collisions touching a delta doc only
    * (delta ⋈ old ∪ delta ⋈ delta on the 8-byte key; sizes bounded to
    * the touched docs). This was the LAST O(Σ df²)-on-append family:
    * with it the whole audit tier appends at O(delta × postings). */
  private def brutePairStatsDelta(s: SparkSession, dir: String)
                                 (prior: DataFrame,
                                  newIds: DataFrame): DataFrame = {
    val sh = shingleHashes3(s, dir).select(col("doc_id"), col("h"))
    val shNew = sh.join(newIds, Seq("doc_id"), "left_semi")
    val shOld = sh.join(newIds, Seq("doc_id"), "left_anti")
    val coll = shNew.as("a").join(shOld.as("b"), col("a.h") === col("b.h"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .unionByName(shNew.as("a").join(shNew.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")))
    val c = coll.groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("c"))
    val ids = c.select(col("doc_a").as("doc_id"))
      .unionByName(c.select(col("doc_b").as("doc_id"))).distinct()
    val sz = sh.join(ids, Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val fresh = c
      .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"), col("c"),
        col("sa.n").as("na"), col("sb.n").as("nb"))
    fresh // appendOnly: the store hard-links the prior rows beside these
  }

  /** The per-document 16-component MinHash signatures over 3-gram
    * shingles (`minhash_sig3_v1`, documents fingerprint) — the
    * corpus-LINEAR state every production MinHash pipeline persists:
    * one md5 + 16 affine permutations per shingle happen once per
    * corpus, and every banding consumer (q27's LSH path, the
    * q175/q180/q182 audits) reads 17 longs per document instead of
    * re-hashing the corpus. Unlike [[brutePairStats]] (audit-only —
    * pair-quadratic), this artifact is the SERVE path's own state.
    * Delta-generational: a doc's signature is a pure aggregate of its
    * own shingle x-values, so an append signs only the appended docs —
    * read from the (delta-built) shingle artifact, hash-once intact. */
  private[graft] def minhashSig3(s: SparkSession, dir: String): DataFrame =
    graft.ArtifactStore.documentsDeltaArtifact(s, dir, "minhash_sig3_v1")(
      docs => Dedup.minhashSigFromX(shingleHashes3(s, dir)
        .join(docs.select(col("doc_id")), Seq("doc_id"), "left_semi")))

  /** The banded CANDIDATE pairs with their signature agreement
    * (`banded_cand_nmatch_v1`, documents fingerprint): every (da, db)
    * the served r=4 banding surfaces, carrying the 16-component match
    * count. This is the candidate list a production LSH pipeline
    * materializes anyway — bounded by the banding, corpus-scale-safe —
    * and the last per-query repeat in the dedup family: q175's
    * calibration and q180's sweep each re-ran the band self-join and
    * two signature joins per query; both now read three longs per
    * candidate. q27 deliberately keeps its inline candidate stage: it
    * IS the production path whose plan shape (bands → candidates →
    * verify) the artifact's build runs, and its plan pin documents
    * that shape. Invalidated by the takedown cascade; oracles
    * recompute from the corpus in SQL, unchanged. */
  private[graft] def bandedCandNMatch(s: SparkSession, dir: String): DataFrame =
    graft.ArtifactStore.documentsPairArtifact(s, dir, "banded_cand_nmatch_v1",
      appendOnly = true, pairCols = ("da", "db"))(
      bandedCandNMatchDirect(s, dir))(
      bandedCandNMatchDelta(s, dir))

  /** The from-scratch candidate-agreement pipeline (full-build thunk
    * and delta-spec reference). */
  private[graft] def bandedCandNMatchDirect(s: SparkSession,
                                            dir: String): DataFrame = {
    val sig = minhashSig3(s, dir)
    val matches = (0 until Dedup.MinHashK).map(i =>
      when(col(s"sa.h$i") === col(s"sb.h$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    Dedup.bandedCandidates(Dedup.minhashBands(sig))
      .join(sig.as("sa"), col("da") === col("sa.doc_id"))
      .join(sig.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"), matches.as("n_match"))
  }

  /** Append-incremental candidate agreement: n_match is a pure pair
    * function of two signatures an append never changes for old docs —
    * prior rows carry verbatim; fresh candidates are band collisions
    * touching a delta doc (delta bands against the full table), their
    * agreement scored by the same 16-component expression. */
  private def bandedCandNMatchDelta(s: SparkSession, dir: String)
                                   (prior: DataFrame,
                                    newIds: DataFrame): DataFrame = {
    val sig = minhashSig3(s, dir)
    val bands = Dedup.minhashBands(sig)
    val bandsNew = bands.join(newIds, Seq("doc_id"), "left_semi")
    val cand = bandsNew.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("da"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("db"))
      .distinct()
    val matches = (0 until Dedup.MinHashK).map(i =>
      when(col(s"sa.h$i") === col(s"sb.h$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val fresh = cand
      .join(sig.as("sa"), col("da") === col("sa.doc_id"))
      .join(sig.as("sb"), col("db") === col("sb.doc_id"))
      .select(col("da"), col("db"), matches.as("n_match"))
    fresh // appendOnly: the store hard-links the prior rows beside these
  }

  /** q25 — brute-force word-3-gram Jaccard pairs ≥ 0.5, served from
    * the [[brutePairStats]] facts (the inverted shingle join runs at
    * artifact build, once per corpus). The jaccard expression is the
    * identical double division over the identical longs, so the
    * served values are bit-equal to the inline form's. */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val j = col("c").cast(DoubleType) / (col("na") + col("nb") - col("c"))
    brutePairStats(s, dir)
      .where(j >= 0.5)
      .select(col("doc_a"), col("doc_b"), j.as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q26 — 16-way MinHash signature per document ('|'-joined int mins). */
  def minhashSig(s: SparkSession, dir: String): DataFrame = {
    val sig = Dedup.minhashSig(Dedup.tokenSet(Tables.documents(s, dir)))
    val cols = (0 until Dedup.MinHashK).map(i => col(s"h$i"))
    sig.select(col("doc_id"), concat_ws("|", cols: _*).as("sig")).orderBy(col("doc_id"))
  }

  /** q27 — the LSH scale path: banded MinHash over word-3-gram shingles,
    * then true shingle Jaccard ≥ 0.5 verified on candidates only. Same
    * near-dup definition as brute-force q25, so the two results measure
    * LSH recall directly. (Unigram token sets are degenerate here: the
    * tiny shared vocabulary makes thousands of documents share one
    * identical token set, so every band collides and the candidate set
    * goes quadratic — 3-gram shingles keep buckets small.) */
  def minhashNearDup(s: SparkSession, dir: String): DataFrame = {
    // Signatures and shingle hashes both come from their build-once
    // artifacts (no md5/xxhash64 of a shingle in this plan);
    // verification stays CANDIDATE-LOCAL on the 8-byte keys, the
    // production scale shape: at 100 TB the banded candidate set is
    // the only pair set a dedup run may materialize, never the brute
    // facts (those are the AUDITS' artifact — q25/q142/q175/q180/q182).
    val dt = shingleHashes3(s, dir).select(col("doc_id"), col("h")).persist()
    val bands = Dedup.minhashBands(minhashSig3(s, dir)).persist()
    val cand = Dedup.bandedCandidates(bands)
    val sz = dt.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // verification joins on the hashed shingle keys (internal; output unaffected)
    val dth = dt.select(col("doc_id"), col("h"))
    val common = cand
      .join(dth.as("x"), col("x.doc_id") === col("da"))
      .join(dth.as("y"), col("y.doc_id") === col("db") && col("y.h") === col("x.h"))
      .groupBy("da", "db").agg(count(lit(1)).as("c"))
    val j = col("c").cast(DoubleType) / (col("sa.n") + col("sb.n") - col("c"))
    common
      .join(sz.as("sa"), col("da") === col("sa.doc_id"))
      .join(sz.as("sb"), col("db") === col("sb.doc_id"))
      .where(j >= 0.5)
      .select(col("da").as("doc_a"), col("db").as("doc_b"), j.as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q175 — MinHash estimator CALIBRATION: for every banded candidate
    * pair, the signature-agreement estimate (matching components / 16)
    * beside the exact shingle Jaccard it estimates. This is the audit
    * that justifies the dedup family's banding dial: q27 verifies
    * candidates at true Jaccard and q142 measures bucket recall, but
    * neither answers "how biased is the 16-component estimator on the
    * pairs the bands actually surface" — the number that decides
    * whether a pipeline can skip verification at some threshold
    * (Broder's classic resemblance-estimation trade).
    *
    * Scale shape: both arms are build-once artifacts —
    * [[bandedCandNMatch]] carries the candidate pairs with their
    * 16-component agreement (q27's candidate stage, run at artifact
    * build), [[brutePairStats]] the exact facts — so the query is one
    * equi-join and a projection. Pairs sharing bands but zero
    * shingles (possible only through 60-bit minhash collisions)
    * coalesce to Jaccard 0 rather than dropping out.
    *
    * Any persisted intermediate in this file is lazy plan-branch
    * sharing, not owned state: queries return before any action runs,
    * so lifecycle belongs to the caller — Bench sweeps persistent
    * RDDs between queries; any other long-lived session should
    * `spark.catalog.clearCache()` (q27's standing convention). */
  def minhashCalibration(s: SparkSession, dir: String): DataFrame = {
    // candidates-with-agreement and pair facts both come from their
    // build-once artifacts — this audit re-hashes nothing and re-joins
    // nothing but the one fact lookup
    val est = bandedCandNMatch(s, dir)
    // exact arm from the brute_pair_stats_v1 facts: a candidate pair
    // missing there shares bands but ZERO shingles (60-bit minhash
    // collision) — exactly the coalesce-to-0 case, and 0/(na+nb) is
    // IEEE +0.0 like the literal, so served values stay bit-equal.
    // The left join's preserved side (candidates) is the SMALL one,
    // so a direct left join cannot broadcast (Spark builds the
    // non-preserved side) and would shuffle+sort every fact row;
    // semi-filter the facts to the candidate pairs first — one
    // shuffle-free scan of the facts artifact — and the residual
    // lookup side broadcasts into the outer join. No broadcast HINTS:
    // the candidate volume is banding-bounded but not constant-bounded
    // (a forced broadcast would be the 100 TB failure mode), and the
    // artifact scans carry size stats, so Catalyst picks the broadcast
    // at any scale where it is safe and AQE degrades to a shuffle
    // join from runtime sizes where it is not.
    val facts = brutePairStats(s, dir)
      .select(col("doc_a").as("da"), col("doc_b").as("db"),
        col("c"), col("na"), col("nb"))
      .join(est.select(col("da"), col("db")), Seq("da", "db"), "left_semi")
    est
      .join(facts, Seq("da", "db"), "left")
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("n_match"),
        (col("n_match").cast(DoubleType) / lit(Dedup.MinHashK.toDouble))
          .as("est_sim"),
        coalesce(col("c"), lit(0L)).as("n_common"),
        when(col("c").isNull, lit(0.0))
          .otherwise(col("c").cast(DoubleType) /
            (col("na") + col("nb") - col("c"))).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q177 — per-document n-gram NOVELTY: the share of a document's
    * distinct 3-gram shingles that appear in no other document. The
    * cross-document complement of q74 (intra-doc repetition) and q81
    * (the global boilerplate list): a doc scoring low here is ASSEMBLED
    * from text that exists elsewhere in the corpus — template farms,
    * mirrored spans, licence blocks — even when no single near-dup
    * partner (q27) exists. Curation pipelines weight such docs down
    * before training. All-integer milli score (q69's rule).
    *
    * Scale shape: shingles hash to 8 bytes once; the document-frequency
    * table partial-aggregates map-side; the join back is equi on the
    * hash with exactly ONE df row per shingle — no fan-out, no window,
    * no strings past the map side.
    *
    * Parity caveat: the Spark arm computes df over xxhash64(shingle)
    * while the oracle groups raw shingle strings (q25's convention), so
    * row-for-row equality is probabilistic, not by construction — a
    * cross-document 64-bit collision between two distinct shingles
    * would inflate a df on the Spark side only (~n²/2⁶⁵; negligible at
    * any corpus this engine will see, and collision-free at every
    * tested SF). */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    val dt = shingleHashes3(s, dir).select(col("doc_id"), col("h"))
    val dfreq = dt.groupBy(col("h")).agg(count(lit(1)).as("df"))
    dt.join(dfreq, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2L, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        expr("((n_shingles - n_shared) * 1000) div n_shingles")
          .as("novelty_milli"))
      .orderBy(col("doc_id"))
  }

  /** Thresholds for q180's sweep, in exact milli-Jaccard. */
  private val SweepTaus = Seq(300L, 400L, 500L, 600L, 700L, 800L)

  /** q180 — dedup THRESHOLD SWEEP: for each candidate Jaccard
    * threshold, how many near-dup pairs exist and how many documents
    * they touch — the tuning artifact behind q27's ≥ 0.5 dial (q161 is
    * the same artifact for the IVF probe budget, q142 for the bands).
    * Computed over the banded candidate set, deliberately: the sweep
    * answers "what would THIS pipeline merge at threshold τ", and its
    * low-τ rows read alongside q142's bucket-recall audit. The
    * predicate is exact integer arithmetic — c·1000 ≥ τ·(na+nb−c) ⟺
    * j ≥ τ/1000 — so both engines count identical pairs.
    *
    * Scale shape: candidates and exact facts are build-once artifacts
    * ([[bandedCandNMatch]] / [[brutePairStats]]), so the sweep is one
    * equi-join; the 6-row threshold frame broadcasts; both rollups
    * are group-cardinality aggregations. */
  def dedupThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    // candidates from their build-once artifact, exact overlap facts
    // from the pair-stats artifact — the sweep re-hashes nothing and
    // re-derives no candidate (a candidate pair missing from the facts
    // shares zero shingles and can never be admitted at any τ > 0, so
    // the inner join loses no admissible pair — the inline form
    // dropped those pairs the same way through its inner verification
    // join)
    val cand = bandedCandNMatch(s, dir).select(col("da"), col("db"))
    // inner join with the facts streaming against the (statistically
    // small) candidate side: one shuffle-free scan of the facts
    // artifact at tested scale (q175's shape; no broadcast hint for
    // the same unboundedness reason documented there)
    val pairs = brutePairStats(s, dir)
      .select(col("doc_a").as("da"), col("doc_b").as("db"),
        col("c"), col("na"), col("nb"))
      .join(cand, Seq("da", "db"))
    sweepOver(s, pairs)
  }

  /** q180's sweep tail over an exact-pair frame (da, db, c, na, nb) —
    * shared with [[graft.streaming.StreamDupEdges.sweepFromStore]],
    * which feeds it the stream-maintained pair store instead of the
    * corpus-derived candidate stage (same rows by construction, so the
    * dashboard sweep equals the batch sweep). The 6-row threshold
    * frame broadcasts; both rollups are group-cardinality-sized. */
  private[graft] def sweepOver(s: SparkSession, pairs: DataFrame): DataFrame = {
    import s.implicits._
    val admitted = pairs
      .crossJoin(broadcast(SweepTaus.toDF("tau_milli")))
      .where(col("c") * 1000L >= col("tau_milli") * (col("na") + col("nb") - col("c")))
      .persist()
    val nPairs = admitted.groupBy(col("tau_milli"))
      .agg(count(lit(1)).as("n_pairs"))
    val nDocs = admitted
      .select(col("tau_milli"), explode(array(col("da"), col("db"))).as("d"))
      .distinct()
      .groupBy(col("tau_milli")).agg(count(lit(1)).as("n_docs"))
    broadcast(SweepTaus.toDF("tau_milli"))
      .join(nPairs, Seq("tau_milli"), "left")
      .join(nDocs, Seq("tau_milli"), "left")
      .select(col("tau_milli"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy(col("tau_milli"))
  }

  /** Rows-per-band configurations for q182's sweep (divisors of
    * MinHashK; served config is Dedup.RowsPerBand = 4). */
  private val BandConfigs = Seq(1, 2, 4, 8, 16)

  /** q182 — LSH BAND-CONFIGURATION recall curve: for every
    * rows-per-band r (16/r bands over the same 16-component
    * signatures), the candidate-pair count and the recall against the
    * exact-Jaccard ≥ 0.5 truth set. This is the S-curve every LSH
    * deployment tunes on (Leskovec/Rajaraman/Ullman's banding
    * analysis, measured on THIS corpus and THIS hash family): r=1 is
    * the high-recall/low-precision end (any shared component makes a
    * candidate), r=16 demands full signature agreement; the served
    * r=4 sits where q142's audit reads. q142 audits the one deployed
    * point; q161 is the same artifact for the IVF probe dial; q180
    * sweeps the verify threshold — this sweeps the band geometry.
    *
    * Scale shape: signatures hash once (q27's discipline) and feed all
    * five band plans; each config is a banded bucket equi-join on
    * md5 keys; truth is the q25-shaped inverted shingle join (bounded
    * by Σ_shingle count², the audit's intrinsic cost, same as q142);
    * rollups are 5-row aggregations. All-integer milli recall. */
  def bandRecallCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // persist: the five band configs and both self-join sides otherwise
    // scan the sig artifact ~10× — with the bucket-partitioned store
    // (8+ files at sf0.1, thousands at corpus scale) the per-scan
    // listing/footer tax multiplied into the r13 bench watch
    // (q182 1.15 → 1.51 s); one materialized scan feeds all plans
    val sig = minhashSig3(s, dir).persist()
    // exact truth from the brute_pair_stats_v1 facts (build-once):
    // 3c >= na+nb ⟺ jaccard >= 0.5, all-integer
    val truth = brutePairStats(s, dir)
      .where(col("c") * 3 >= col("na") + col("nb"))
      .select(col("doc_a").as("da"), col("doc_b").as("db"))
      .persist()
    // all five configs' band keys in ONE relation tagged by config —
    // one self-join and one distinct instead of five of each (the
    // config tag rides the join key, so cross-config pairs never form);
    // candidates and captured-truth then roll up in a single pass over
    // a left join against the (persisted) truth set
    val bandsAll = BandConfigs.map { r =>
      Dedup.minhashBandsCfg(sig, r)
        .select(lit(r.toLong).as("rows_per_band"), col("doc_id"),
          col("band"), col("bv"))
    }.reduce(_ unionByName _)
    val tagged = bandsAll.as("a")
      .join(bandsAll.as("b"),
        col("a.rows_per_band") === col("b.rows_per_band") &&
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.rows_per_band").as("rows_per_band"),
        col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val rollup = tagged
      .join(truth.withColumn("t", lit(1L)), Seq("da", "db"), "left")
      .groupBy(col("rows_per_band"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(coalesce(col("t"), lit(0L))).as("n_captured"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    broadcast(BandConfigs.map(_.toLong).toDF("rows_per_band"))
      .join(rollup, Seq("rows_per_band"), "left")
      .crossJoin(broadcast(nTruth))
      .select(col("rows_per_band"),
        expr(s"${Dedup.MinHashK} div rows_per_band").as("n_bands"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("n_truth"),
        coalesce(col("n_captured"), lit(0L)).as("n_captured"))
      // n_truth = 0 (a dup-free corpus) must yield a DEFINED zero curve
      // on both engines: unguarded, Spark's `div` nulls the column while
      // DuckDB's `//` raises division-by-zero — a cross-engine divergence
      .withColumn("recall_milli",
        when(col("n_truth") === 0, lit(0L))
          .otherwise(expr("(n_captured * 1000) div n_truth")))
      .orderBy(col("rows_per_band"))
  }

  /** q28 — 48-bit frequency-weighted SimHash fingerprint per document. */
  def simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** q29 — SimHash near-dups: 12-bit band-equality candidates (pigeonhole
    * guarantees recall for hamming ≤ 3), hamming verified via
    * bit_count(xor). */
  def simhashNearDup(s: SparkSession, dir: String): DataFrame = {
    // both self-join sides derive from the 48-aggregation fingerprint pass
    val fp = Dedup.simhash(Tables.documents(s, dir)).persist()
    val bandCols = (0 until 4).map(j =>
      struct(lit(j).as("band"), Dedup.simhashBand(col("simhash"), j).as("bv")))
    val bands = fp.select(col("doc_id"), col("simhash"),
        explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band").as("band"), col("b.bv").as("bv"))
    val ham = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast(LongType)
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        ham.as("hamming"))
      .distinct()
      .where(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q54 — the MLlib-builtin MinHash path (SURVEY §4's decision-table
    * alternative to the hand-rolled q27): HashingTF token sets →
    * `MinHashLSH.approxSimilarityJoin` at Jaccard distance ≤ 0.5.
    * Deterministic under the fixed seed but the hash parameters are not
    * reproducible in DuckDB — declared without an oracle (rows-only).
    */
  def minhashMllib(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    // 3-gram shingles, same near-dup definition as q25/q27 — unigram
    // token sets are degenerate on this corpus (identical sets → huge
    // LSH buckets → quadratic join; measured 500 s at sf0.1)
    val sh = Dedup.shingles(Tables.documents(s, dir), 3)
      .groupBy("doc_id").agg(collect_list(col("s")).as("w"))
    val tf = new HashingTF().setInputCol("w").setOutputCol("tfv")
      .setNumFeatures(1 << 18).setBinary(true).transform(sh)
    val model = new MinHashLSH().setInputCol("tfv").setOutputCol("mh")
      .setNumHashTables(4).setSeed(42L).fit(tf)
    model.approxSimilarityJoin(tf, tf, 0.5, "dist")
      .select(col("datasetA.doc_id").as("doc_a"),
        col("datasetB.doc_id").as("doc_b"), col("dist"))
      .where(col("doc_a") < col("doc_b"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q73 — dedup-cluster resolution: connected components over the q27
    * near-dup graph by distributed min-label propagation with pointer
    * jumping, run to a fixpoint. Every doc appearing in a near-dup pair
    * is labeled with the smallest doc_id reachable from it — the cluster
    * representative a curation pipeline keeps when it drops the rest.
    *
    * Scale shape: loop state is one (id, comp) row per vertex; each
    * round is a neighbor-min aggregation plus a pointer-jump self-join,
    * both shuffling 8-byte keys only. Pointer jumping (comp ← comp of
    * comp) contracts label chains, so rounds scale with log(diameter),
    * not diameter. Lineage is truncated with localCheckpoint every
    * round (on a real cluster a reliable checkpoint dir does the same
    * without pinning executor memory). The driver loop carries only a
    * converged flag — never row data.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    clusterLabels(s, dir)
      .select(col("id").as("doc_id"), col("comp")).orderBy(col("doc_id"))

  /** q73's component labels (id, comp) without the presentation sort —
    * shared with q141, which re-aggregates them and must not inherit a
    * useless mid-plan global order. Only graph-member docs appear;
    * consumers treat absent docs as singleton components. */
  /** q27's near-dup pair list as a persistent corpus artifact
    * (ArtifactStore, documents fingerprint): built once per corpus,
    * shared by q73's clustering, q139's leakage audit, q142's LSH
    * audit, q144's cascade, and q156's source matrix. DELTA ON PURE
    * APPEND (r15 verdict item 1): an append leaves old docs'
    * signatures, band buckets, and shingle sets untouched, so the
    * old-old verified pairs ARE the prior generation verbatim and the
    * only new pairs collide with a delta doc — [[minhashPairsDelta]]
    * bands and verifies just those; removals/changes demote to one
    * full rebuild. In the takedown cascade. */
  private[graft] def minhashPairsArtifact(s: SparkSession, dir: String): DataFrame =
    graft.ArtifactStore.documentsPairArtifact(s, dir, "minhash_pairs_v1",
      appendOnly = true)(
      minhashNearDup(s, dir).select(col("doc_a"), col("doc_b")))(
      minhashPairsDelta(s, dir))

  /** The append-incremental q27 algebra: candidates = the banded
    * self-join RESTRICTED to collisions touching a delta doc (the
    * delta docs' band rows against the full band table — no old-old
    * fan-out anywhere), verification = q27's exact shingle-overlap
    * join over those candidates only, sizes bounded to candidate
    * docs. Bands, signatures, and shingle hashes all come off their
    * delta-carried stores, so the build re-hashes only the appended
    * docs and reads no corpus text. */
  private def minhashPairsDelta(s: SparkSession, dir: String)
                               (prior: DataFrame,
                                newIds: DataFrame): DataFrame = {
    val bands = Dedup.minhashBands(minhashSig3(s, dir))
    val bandsNew = bands.join(newIds, Seq("doc_id"), "left_semi")
    val cand = bandsNew.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("da"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("db"))
      .distinct()
    val dt = shingleHashes3(s, dir).select(col("doc_id"), col("h"))
    val ids = cand.select(col("da").as("doc_id"))
      .unionByName(cand.select(col("db").as("doc_id"))).distinct()
    val sz = dt.join(ids, Seq("doc_id"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = cand
      .join(dt.as("x"), col("x.doc_id") === col("da"))
      .join(dt.as("y"),
        col("y.doc_id") === col("db") && col("y.h") === col("x.h"))
      .groupBy("da", "db").agg(count(lit(1)).as("c"))
    val j = col("c").cast(DoubleType) / (col("sa.n") + col("sb.n") - col("c"))
    val fresh = common
      .join(sz.as("sa"), col("da") === col("sa.doc_id"))
      .join(sz.as("sb"), col("db") === col("sb.doc_id"))
      .where(j >= 0.5)
      .select(col("da").as("doc_a"), col("db").as("doc_b"))
    fresh // appendOnly: the store hard-links the prior rows beside these
  }

  /** The component labels as a persistent corpus artifact (r8 verdict
    * item: q145/q129/q141/q156 re-ran Gate + union-find per query).
    * The labels are derived state exactly like the edge list they come
    * from — same documents fingerprint keys both — so every consumer
    * reads a tiny (id, comp) parquet; the Gate count and the union-find
    * / label-propagation fixpoint run once per CORPUS, not per query. */
  private def clusterLabels(s: SparkSession, dir: String): DataFrame =
    graft.ArtifactStore.documentsArtifact(s, dir, "cluster_labels_v1")(
      buildClusterLabels(s, dir))

  private def buildClusterLabels(s: SparkSession, dir: String): DataFrame =
    // q27's pair join materialized once per CORPUS (ArtifactStore):
    // the edge list is parquet-backed, so the Gate count and both
    // cluster branches read files instead of re-running the minhash
    // pipeline — and any later run over the same corpus reuses it.
    clusterLabelsOver(minhashPairsArtifact(s, dir))

  /** The label pipeline over ANY (doc_a, doc_b) edge frame — shared by
    * the batch artifact build and the stream-maintained edge target
    * ([[graft.streaming.StreamDupEdges]]), so both serve identical
    * clusters by construction.
    *
    * The near-dup GRAPH is orders of magnitude smaller than the corpus
    * (only docs with a >= 0.5-Jaccard partner). Below ~1M edges the
    * distributed fixpoint is pure scheduling overhead — solve the
    * whole graph in ONE task with union-find (mapPartitions, no
    * driver collect); above the gate, run distributed min-label
    * propagation. Same measured-gate pattern as q30's brute fallback
    * (graft.Gate); the count is one cheap scan of the edge parquet. */
  private[graft] def clusterLabelsOver(pairs: DataFrame): DataFrame =
    graft.Gate.byCount(pairs, 1000000L)(
      unionFindOneTask(pairs))(
      labelPropagate(
        pairs.unionByName(
          pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
          .toDF("src", "dst")))

  /** q141 — the dedup ROI report: the cluster-size histogram of the
    * near-dup components plus what removing non-canonical members buys
    * — for each cluster size, how many clusters exist, how many
    * documents and duplicate documents they hold, and the exact
    * characters a keep-the-min-id policy deletes. This is the number a
    * curation run quotes when it claims "near-dedup removed N% of the
    * corpus", and the size histogram is the standard skew check before
    * committing to it (one mega-cluster usually means the similarity
    * threshold, not the data, made the decision). Docs outside the
    * near-dup graph count as singleton clusters, so every corpus row
    * is accounted for: Σ n_docs == corpus size.
    *
    * Scale shape: the labels are the ArtifactStore-backed q73 plan (the
    * edge parquet is read, not recomputed); the docs↔labels equi-join
    * shuffles 16-byte (id, comp) pairs against the slim (doc_id,
    * n_chars) projection; both rollups partial-aggregate —
    * component-cardinality first, then the ≤ max-cluster-size key
    * space. No windows, no sorts beyond the presentation ORDER BY. */
  def dedupStats(s: SparkSession, dir: String): DataFrame = {
    val labels = clusterLabels(s, dir)
      .select(col("id").as("doc_id"), col("comp"))
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    val perCluster = docs.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("comp"), col("doc_id")).as("comp"))
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("sz"),
        sum(col("n_chars")).as("chars_total"),
        // min-id canonical convention: comp IS the kept member's id
        sum(when(col("doc_id") =!= col("comp"), col("n_chars"))
          .otherwise(lit(0L))).as("chars_removed"))
    perCluster.groupBy(col("sz"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("sz")).as("n_docs"),
        sum(col("sz") - 1L).as("dup_docs"),
        sum(col("chars_total")).as("chars_total"),
        sum(col("chars_removed")).as("chars_removed"))
      .select(col("sz").as("cluster_size"), col("n_clusters"), col("n_docs"),
        col("dup_docs"), col("chars_total"), col("chars_removed"))
      .orderBy(col("cluster_size"))
  }

  /** q142 — LSH recall audit: the empirical S-curve of the banded
    * MinHash path, measured against ground truth. Per jaccard bucket
    * (integer twentieths — bucket 10 is [0.50,0.55), bucket 20 is
    * exactly 1.0), how many true near-dup pairs exist (brute shingle
    * join, q25's definition) and how many of them the q27 banded path
    * actually surfaced. This is the audit a pipeline runs before
    * trusting LSH dedup at full scale: recall loss concentrates in the
    * lowest buckets (pairs just over threshold collide in no band), and
    * the per-bucket curve says whether the (bands, rows) choice — not
    * the data — is deciding what gets deduplicated. Same idiom as the
    * q129 ANN-recall and q134 truncation audits: the approximation and
    * its ground truth as one oracle-checked result.
    *
    * All thresholding and bucketing is exact integer arithmetic
    * (j ≥ 0.5 ⇔ 3c ≥ na+nb; bucket = 20c div u) — no float boundary
    * can disagree cross-engine. The LSH arm reads the ArtifactStore edge
    * parquet q73/q141 share (free after the first graph query of the
    * run); the brute arm is the audit's intrinsic cost, and at 100 TB
    * it is the part you'd sample — the engine-side plan stays one
    * shingle scan feeding an inverted-index join bounded by
    * Σ_shingle count², never a crossJoin. */
  def lshAudit(s: SparkSession, dir: String): DataFrame = {
    // exact leg from the brute_pair_stats_v1 facts (build-once); the
    // bucket expression is the identical integer arithmetic
    val ex = brutePairStats(s, dir)
      .where(col("c") * 3 >= col("na") + col("nb"))
      .select(col("doc_a"), col("doc_b"),
        expr("(20 * c) div (na + nb - c)").as("j_bucket"))
    val found = minhashPairsArtifact(s, dir).withColumn("f", lit(1L))
    ex.join(found, Seq("doc_a", "doc_b"), "left")
      .groupBy(col("j_bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce(col("f"), lit(0L))).as("n_found"))
      .orderBy(col("j_bucket"))
  }

  /** q145 — canonical selection, the dedup APPLY step: per near-dup
    * cluster, the member a keep-the-best policy retains. Policy here:
    * most whitespace tokens, ties to the smallest doc_id — the
    * "longest member" rule production near-dedup pipelines default to
    * (the longest variant usually subsumes its truncated/boilerplate-
    * trimmed near-dups). Each cluster row carries the kept member,
    * the token mass dropped, and whether the pick agrees with q141's
    * keep-the-min-id convention — the delta between the two policies
    * is exactly what a curation review wants on one page.
    *
    * The argmax is a SCALAR max_by key: (n_tok, -doc_id) packed into
    * one BIGINT (n_tok·2^33 − doc_id), so both engines order
    * identically with no struct-comparator semantics in play (DuckDB
    * arg_max over a struct key is unsupported) and the aggregation
    * stays a partial-agg — no window, no sort before the presentation
    * ORDER BY. Labels come from the ArtifactStore-backed q73 plan (the
    * edge parquet is read, not recomputed); the docs↔labels join
    * shuffles 8-byte ids against the slim (doc_id, n_tok) projection.
    */
  def canonicalPick(s: SparkSession, dir: String): DataFrame = {
    val labels = clusterLabels(s, dir) // (id, comp); members only
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast(LongType).as("n_tok"))
    labels.join(docs, col("id") === col("doc_id"))
      .select(col("comp"), col("doc_id"), col("n_tok"),
        (col("n_tok") * lit(8589934592L) - col("doc_id")).as("pk"))
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("sz"),
        expr("max_by(doc_id, pk)").as("keep_doc"),
        expr("max_by(n_tok, pk)").as("keep_n_tok"),
        sum(col("n_tok")).as("tok_total"))
      .select(col("comp"), col("sz"), col("keep_doc"), col("keep_n_tok"),
        col("tok_total"),
        (col("tok_total") - col("keep_n_tok")).as("tok_dropped"),
        when(col("keep_doc") === col("comp"), 1L).otherwise(0L)
          .as("minid_agrees"))
      .orderBy(col("comp"))
  }


  /** q173 — cluster-aware split REPAIR (the ACTION on q139's leakage
    * audit): every document's split becomes the split of its near-dup
    * cluster REPRESENTATIVE (the min-id member — the comp label
    * itself), so no near-dup cluster straddles train/val/test and the
    * q139 leakage channel through near-duplicate documents closes by
    * construction. Emits per doc the old hash split (q138's frozen
    * rule), the repaired split, and the moved flag — the migration
    * manifest a pipeline applies and the count it reports ("split
    * repair moved N docs"). Singletons (docs outside the near-dup
    * graph) keep their hash split: comp = doc_id, new == old.
    *
    * Scale shape: the labels are the cluster_labels_v1 artifact (tiny
    * parquet, built once per corpus); the docs↔labels join shuffles
    * 8-byte ids; both splits are row-local hash arithmetic (q138's
    * md5 rule applied to doc_id and to comp); no windows, no corpus
    * self-join.
    */
  def splitRepair(s: SparkSession, dir: String): DataFrame = {
    def splitOf(c: Column): Column = {
      val bk = pmod(call_function("graft_h60",
        concat(lit("split|"), c.cast("string"))), lit(10L))
      when(bk < 8, "train").when(bk === 8, "val").otherwise("test")
    }
    val labels = clusterLabels(s, dir)
      .select(col("id").as("doc_id"), col("comp"))
    Tables.documents(s, dir).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"))
      .select(col("doc_id"), col("comp"),
        splitOf(col("doc_id")).as("old_split"),
        splitOf(col("comp")).as("new_split"))
      .withColumn("moved",
        when(col("old_split") =!= col("new_split"), 1L).otherwise(0L))
      .orderBy(col("doc_id"))
  }

  /** Small-graph path: the entire edge list flows to one task which
    * runs union-find with min-id roots — zero loop shuffles, output
    * identical to [[labelPropagate]]. */
  private def unionFindOneTask(pairs: DataFrame): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    pairs.select(col("doc_a").cast(LongType), col("doc_b").cast(LongType))
      .as[(Long, Long)].coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        val ids = scala.collection.mutable.TreeSet[Long]()
        it.foreach { case (a, b) =>
          ids += a; ids += b
          val (ra, rb) = (find(a), find(b))
          // min root wins, so every root is its component's min id
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
        ids.iterator.map(id => (id, find(id)))
      }
      .toDF("id", "comp")
  }

  /** Large-graph path: distributed min-label propagation with pointer
    * jumping to a fixpoint over a SYMMETRIC (src, dst) edge list.
    * Loop state is one (id, comp) row per vertex; each round is a
    * neighbor-min aggregation plus a pointer-jump self-join, both
    * shuffling 8-byte keys only. Pointer jumping (comp ← comp of comp)
    * contracts label chains, so rounds scale with log(diameter), not
    * diameter. Lineage is truncated with localCheckpoint every round
    * (a reliable checkpoint dir on a real cluster). The driver loop
    * carries only a converged flag — never row data. */
  private[queries] def labelPropagate(sym: DataFrame): DataFrame = {
    val edges = sym.persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    var converged = edges.isEmpty
    while (!converged) {
      val nbrMin = edges.as("e")
        .join(labels.as("l"), col("e.dst") === col("l.id"))
        .groupBy(col("e.src").as("id")).agg(min(col("l.comp")).as("nbr"))
      // comp only ever decreases and always holds a vertex id, so the
      // pointer-jump self-join below is total (every comp resolves).
      val stepped = labels.as("l")
        .join(nbrMin.as("p"), Seq("id"), "left")
        .select(col("id"),
          least(col("l.comp"), coalesce(col("p.nbr"), col("l.comp"))).as("comp"))
        .localCheckpoint()
      val jumped = stepped.as("a")
        .join(stepped.select(col("id").as("cid"), col("comp").as("ccomp")).as("b"),
          col("a.comp") === col("b.cid"))
        .select(col("a.id").as("id"), col("b.ccomp").as("comp"))
        .localCheckpoint()
      converged = jumped.as("n")
        .join(labels.as("o"), "id")
        .where(col("n.comp") =!= col("o.comp"))
        .isEmpty
      labels = jumped
    }
    edges.unpersist()
    labels
  }

  /** q76 — train/eval decontamination: flag every training document
    * sharing at least one word-8-gram with the held-out eval slice
    * (docs with doc_id ≡ 0 mod 97 stand in for a benchmark suite —
    * deterministic, so the oracle sees the same slice). The classic
    * pre-training hygiene step: without it, benchmark text inside the
    * training corpus inflates eval scores.
    *
    * Scale shape: the eval side of the inverted 8-gram join is a
    * benchmark suite — megabytes against a 100 TB corpus — so it is
    * explicitly broadcast and the training shingles are NEVER
    * shuffled; per-doc dedup of hits happens under the broadcast join
    * with a (doc_id, eval_doc) aggregation. Shingle strings are
    * replaced by 8-byte xxhash64 keys before the join (engine-internal;
    * the declared output is doc-level, so oracle parity is unaffected).
    */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // Planted contamination (q78's planted-PII precedent): the synthetic
    // corpus has no natural train/eval 8-gram overlap, so the oracle was
    // passing vacuously on 0 rows (r3 verdict). Training docs with
    // doc_id % 11 == 1 get the first 12 tokens of eval doc 0 appended —
    // both engines build the identical augmented corpus, so the query
    // returns a real, hash-checked hit set at every scale factor.
    val plant = docs.where(col("doc_id") === 0)
      .select(concat_ws(" ",
        slice(split(trim(col("text")), "\\s+"), 1, 12)).as("plant"))
    val aug = docs.crossJoin(broadcast(plant))
      .select(col("doc_id"),
        when(col("doc_id") % 11L === 1L,
          concat(col("text"), lit(" "), col("plant")))
          .otherwise(col("text")).as("text"))
    val sh = Dedup.shingles(aug, 8)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val ev = sh.where(col("doc_id") % 97L === 0L)
      .select(col("doc_id").as("eval_doc"), col("h"))
    val tr = sh.where(col("doc_id") % 97L =!= 0L)
    tr.join(broadcast(ev), "h")
      .select(col("doc_id").as("train_doc"), col("eval_doc")).distinct()
      .groupBy("train_doc")
      .agg(count(lit(1)).as("n_eval_hits"), min(col("eval_doc")).as("first_eval"))
      .orderBy(col("train_doc"))
  }

  /** q96 — containment detection (quote/excerpt dedup): for each
    * ordered document pair, containment = |shingles(A) ∩ shingles(B)| /
    * |shingles(A)|. Jaccard misses a short document wholly quoted
    * inside a long one (the union dwarfs the intersection); containment
    * ≥ 0.6 catches exactly that asymmetric case — the "document embedded
    * in another document" pattern (license blocks, quoted replies,
    * syndicated excerpts) that document-level near-dedup leaves behind.
    *
    * Scale shape: the q25 inverted-index pattern — pairs meet ONLY
    * through the 8-byte-hashed shingle equality join (never an
    * all-pairs join), the per-doc shingle-set sizes are a tiny agg
    * joined back on doc_id, and the threshold prunes before output.
    * Hot shingles are dropped before the self-join: a shingle in d
    * documents yields d² join rows, and corpus-scale boilerplate
    * 8-grams (license headers, navigation chrome) live in 10⁵–10⁶
    * docs — 10¹⁰⁺ pairs from one key. The q81 corpus-frequency rule
    * (df > max(5, 1%·N) → boilerplate) caps the per-key fan-out at
    * df² ≤ (1%·N)²; the hot set itself is broadcast-sized by the same
    * bound as q81's boiler list (≤ total-occurrences / threshold) and
    * meets the postings via a broadcast anti-join, never a shuffle.
    * The denominator n stays the FULL shingle count, so containment
    * is conservatively underestimated for boilerplate-heavy docs —
    * a dropped shingle can only remove a pair, never invent one.
    * Engine idiom: Spark computes df over the 64-bit xxhash64 keys
    * while the oracle uses raw shingle strings — a hash collision
    * would merge two shingles' df and inflate `common` on the Spark
    * side only; with ~10⁴ distinct 8-grams per sf the collision odds
    * are ≪ 10⁻¹¹ (same accepted assumption as the q76 join keys).
    */
  def containment(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val nDocs = docs.count() // metadata-only parquet count (q81 precedent)
    val dfCap = math.max(5L, math.ceil(0.01 * nDocs).toLong)
    // four plan branches read the shingle set (sizes, hot list, both
    // join sides) — served from the build-once 8-gram artifact;
    // persist so the artifact scan feeds all four from memory
    val sh = shingleHashes8(s, dir).persist()
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val hot = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") > dfCap).select(col("h"))
    val kept = sh.join(broadcast(hot), Seq("h"), "left_anti")
    val common = kept.as("a").join(kept.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("inner_doc"), col("b.doc_id").as("outer_doc"))
      .groupBy(col("inner_doc"), col("outer_doc"))
      .agg(count(lit(1)).as("common"))
    val cont = col("common").cast(DoubleType) / col("n").cast(DoubleType)
    common.join(sz.withColumnRenamed("doc_id", "inner_doc"), Seq("inner_doc"))
      .where(cont >= 0.6)
      .select(col("inner_doc"), col("outer_doc"), col("common"),
        col("n").as("n_inner"), cont.as("containment"))
      .orderBy(col("inner_doc"), col("outer_doc"))
  }

  /** q138's deterministic split bucket: 60-bit md5 of the doc id,
    * mod 10 — buckets 0–7 train, 8 val, 9 test (the frozen-manifest
    * 80/10/10 convention). Hash-of-key, not random: the split is
    * reproducible from the data alone, survives reruns/backfills, and
    * both engines compute it identically. */
  private def splitBucket: Column =
    pmod(call_function("graft_h60",
      concat(lit("split|"), col("doc_id").cast("string"))), lit(10L))

  private def splitName: Column =
    when(splitBucket < 8, "train").when(splitBucket === 8, "val")
      .otherwise("test")

  /** q138 — the train/val/test split MANIFEST: per (lang, source,
    * split), document and character counts — the artifact a training
    * pipeline freezes so every downstream job agrees on membership
    * without re-deriving it. Split assignment is row-local hash
    * arithmetic; stratification balance per (lang, source) is readable
    * directly off the manifest (the consumer's division).
    *
    * Scale shape: one partial-aggregated groupBy over ≤ langs ×
    * sources × 3 keys; no joins, no windows, row-local bucketing in
    * whole-stage codegen.
    */
  def splitManifest(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), col("source"), splitName.as("split"),
        col("n_chars"))
      .groupBy(col("lang"), col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .orderBy(col("lang"), col("source"), col("split"))

  /** q139 — cross-split LEAKAGE audit of q138's split: how many
    * distinct 8-gram shingles appear in more than one split, and how
    * many test documents share at least one gram with train — the
    * number that decides whether a benchmark score on the test split
    * means anything (q76's decontamination applied to the pipeline's
    * OWN split instead of an external eval set). One row:
    * (n_grams, n_train_val, n_train_test, n_val_test,
    * n_leaky_test_docs).
    *
    * Scale shape: grams travel as 8-byte xxhash64 keys (q96's
    * documented collision assumption); per gram a bit_or of the
    * 3-bit split mask partial-aggregates map-side, the pair counts
    * fold to ONE row, and the leaky-doc pass re-joins test postings
    * to train-bit grams on the hash key — every shuffle is
    * gram-hash- or doc-id-keyed, nothing is all-pairs.
    */
  def splitLeakage(s: SparkSession, dir: String): DataFrame = {
    // split → one-hot bit: train 1, val 2, test 4
    val bit = when(splitBucket < 8, 1L).when(splitBucket === 8, 2L)
      .otherwise(4L)
    // grams from the build-once 8-gram artifact; the split bit is
    // row-local over doc_id, so it re-derives on the artifact rows
    val sh = shingleHashes8(s, dir)
      .select(col("doc_id"), col("h"), bit.as("bit"))
    val masks = sh.groupBy(col("h")).agg(bit_or(col("bit")).as("mask"))
    val pairCounts = masks.agg(count(lit(1)).as("n_grams"),
      sum(when((col("mask").bitwiseAND(lit(3))) === 3, 1L).otherwise(0L))
        .as("n_train_val"),
      sum(when((col("mask").bitwiseAND(lit(5))) === 5, 1L).otherwise(0L))
        .as("n_train_test"),
      sum(when((col("mask").bitwiseAND(lit(6))) === 6, 1L).otherwise(0L))
        .as("n_val_test"))
    val leakyTest = sh.where(col("bit") === 4)
      .join(masks.where((col("mask").bitwiseAND(lit(1))) === 1)
        .select(col("h")), Seq("h"))
      .agg(countDistinct(col("doc_id")).as("n_leaky_test_docs"))
    pairCounts.crossJoin(leakyTest)
  }

  /** q160 — split VOCABULARY-drift audit: per term, the token
    * occurrences falling in each of q138's frozen splits, with the
    * split token totals riding along (rates and a chi-square are the
    * consumer's divisions — q118/q136's exact-integer convention).
    * q138 proves the splits are SIZE-balanced and q139 that they do
    * not leak; this is the third eval-integrity leg — that the
    * held-out splits sample the same LANGUAGE as train (a term whose
    * mass sits wholly in one split means eval perplexity measures
    * vocabulary luck, not model quality).
    *
    * Scale shape: one scan, row-local split hash + tokenize, ONE
    * partial-aggregated groupBy into |vocab| rows of three count
    * monoids; the totals are a 1-row broadcast combine.
    */
  def splitVocabDrift(s: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val t = Tables.documents(s, dir)
      .select(splitName.as("split"), explode(toks).as("term"))
      .where(col("term") =!= "")
    val counts = t.groupBy(col("term"))
      .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    val tot = counts.agg(sum(col("n_train")).as("tot_train"),
      sum(col("n_val")).as("tot_val"), sum(col("n_test")).as("tot_test"))
    counts.crossJoin(broadcast(tot))
      .orderBy(col("term"))
  }

  /** q183 — the corpus DUPLICATION-MASS curve: 3-gram shingle
    * occurrences grouped by the log2 bucket of their document
    * frequency — "what share of the corpus's shingle mass sits in
    * text repeated in 2^k..2^(k+1)-1 documents". The dashboard number
    * large-scale curation reports alongside dedup rates: a heavy tail
    * (high-df buckets holding a visible share) means boilerplate
    * chrome, not organic text, and tells an operator whether to dial
    * df-based boilerplate caps (q81/q96's rule) before pairwise dedup.
    * df_bucket = floor(log2(df)) computed as length(bin(df)) - 1 —
    * pure integer arithmetic both engines reproduce exactly (no float
    * log at power-of-two boundaries).
    *
    * Scale shape: one aggregation over the shingle-hash artifact into
    * |distinct shingles| df rows, a ≤ 64-row rollup, and the corpus
    * total joins back as a broadcast scalar — no windows, no text
    * re-hash (the artifact's build already paid it), nothing
    * pair-shaped anywhere. q177's parity caveat applies: df is
    * counted over the 64-bit hash, the oracle over raw strings —
    * equal unless two distinct shingles collide (~n²/2⁶⁵). */
  def dupMassCurve(s: SparkSession, dir: String): DataFrame = {
    val dfreq = shingleHashes3(s, dir)
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    val b = dfreq
      .select((length(bin(col("df"))) - 1).cast(LongType).as("df_bucket"),
        col("df"))
      .groupBy(col("df_bucket"))
      .agg(count(lit(1)).as("n_shingles"), sum(col("df")).as("n_occ"))
    val tot = b.agg(sum(col("n_occ")).as("tot"))
    b.crossJoin(broadcast(tot))
      .select(col("df_bucket"), col("n_shingles"), col("n_occ"),
        expr("(n_occ * 1000) div tot").as("share_milli"))
      .orderBy(col("df_bucket"))
  }

  /** q192 — EXACT set-similarity self-join by prefix filtering
    * (Chaudhuri et al. 2006's SSJoin primitive; Bayardo et al. 2007's
    * All-Pairs — the PPJoin family's base filter): every document pair
    * with shingle-set Jaccard ≥ 1/2, NO LSH, NO recall loss. Each
    * doc's distinct shingle hashes order RAREST-FIRST (global df asc,
    * hash asc — a total order both engines reproduce); only the
    * (n − ⌈τ·n⌉ + 1)-prefix (= n div 2 + 1 at τ = 1/2) enters the
    * candidate join, because two sets with J ≥ τ MUST collide inside
    * their prefixes under any common global order (the prefix-filter
    * theorem — the spec proves losslessness against a brute all-pairs
    * re-derivation). Candidates verify by exact overlap; 3c ≥ na + nb
    * is J ≥ 1/2 in integers.
    *
    * This is the third member of the ≥ 1/2-Jaccard triangle: q25
    * answers it by the full inverted join (cost Σ_shingle df² — the
    * truth arm), q27 by banded MinHash (probabilistic recall), q192
    * EXACTLY with candidates bounded by PREFIX df — rare-first
    * ordering keeps boilerplate shingles (the fan-out killers) out of
    * prefixes entirely, which is what a 100 TB run uses when the
    * similarity floor is contractual. Sets are keyed by the minhash
    * x-hash (md5-derived — the oracle reproduces it; q177's collision
    * caveat applies at ~n²/2⁶¹). Scale shape: df is one
    * vocabulary-keyed aggregation off the hash-once shingle artifact;
    * the prefix rank is a doc-partitioned window; candidate and
    * verification joins key 8-byte hashes. Nothing all-pairs
    * anywhere. SERVED (r16 — r15 verdict item 2): the pairing runs
    * once per corpus into the [[simJoinPairsArtifact]] store (delta on
    * pure append) and the query reads the pair parquet. */
  def simJoinPrefix(s: SparkSession, dir: String): DataFrame =
    simJoinPairsArtifact(s, dir).orderBy(col("doc_a"), col("doc_b"))

  /** q192's qualifying pairs as a persistent corpus artifact
    * (`simjoin_pairs_v1` — r15 verdict item 2: the exact sim-join was
    * the suite's most expensive query because it re-ranked df,
    * re-built prefixes, and re-verified from the shingle store PER
    * QUERY; its pairs are corpus-keyed exactly like
    * `winnow_pairs_v1`'s, so the pairing runs once per corpus and the
    * query reads a tiny parquet). Same pair-store discipline: delta on
    * pure append ([[simJoinPairsDelta]]), demote-to-full on
    * removal/change, takedown-cascade invalidated; the oracle
    * recomputes from the corpus in SQL, unchanged. */
  private[graft] def simJoinPairsArtifact(s: SparkSession,
                                          dir: String): DataFrame =
    graft.ArtifactStore.documentsPairArtifact(s, dir, "simjoin_pairs_v1",
      appendOnly = true)(
      simJoinPrefixDirect(s, dir))(
      simJoinPairsDelta(s, dir))

  /** The from-scratch q192 pipeline (the artifact's full-build thunk
    * and the delta spec's reference arm). */
  private[graft] def simJoinPrefixDirect(s: SparkSession,
                                         dir: String): DataFrame = {
    // dt/pref are deliberately NOT materialized (measured at sf0.1:
    // localCheckpointing both read 3.85 s min vs 3.10 s recomputed —
    // at ~260k/134k rows the re-derivations off the page-cached
    // artifact are cheaper than two forced materialization jobs; the
    // q182 persist lesson applies to RE-SCANNED store reads, not to
    // small derived frames)
    val dt = shingleHashes3(s, dir).select(col("doc_id"), col("x")).distinct()
    val pref = simJoinPrefixes(dt)
    // candidates with PPJoin's POSITIONAL upper bound (Xiao et al.
    // 2008): in the shared global order every shared element of a
    // qualifying pair sits at-or-after the EARLIEST shared one, so
    // overlap ≤ min(na − ra, nb − rb) + 1 at that collision — and the
    // max over collisions is exactly that earliest-collision bound.
    // Pairs whose bound cannot reach the c ≥ ⌈(na+nb)/3⌉ floor are
    // discarded BEFORE the verification join (measured 409k → 125k
    // candidates at sf0.1, lossless — the spec's brute equality would
    // catch any over-prune).
    val cand = pref.as("a").join(pref.as("b"),
        col("a.x") === col("b.x") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(max(least(col("a.n") - col("a.r"), col("b.n") - col("b.r")) + 1L)
        .as("ub"),
        max(col("a.n")).as("na"), max(col("b.n")).as("nb"))
      .where(col("ub") * 3 >= col("na") + col("nb"))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"))
    simJoinVerify(dt, cand)
  }

  /** The rare-first prefix rows (doc_id, x, r, n) over a distinct
    * (doc_id, x) shingle frame — shared by the full build and the
    * delta arm (which re-ranks under the CURRENT df so both join
    * sides share one global order, the prefix theorem's premise). */
  private def simJoinPrefixes(dt: DataFrame): DataFrame = {
    val dfT = dt.groupBy(col("x")).agg(count(lit(1)).as("df"))
    val sz = dt.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("df"), col("x"))
    dt.join(dfT, Seq("x"))
      .join(sz, Seq("doc_id"))
      .withColumn("r", row_number().over(wOrd))
      .where(col("r") <= expr("(n div 2) + 1"))
      .select(col("doc_id"), col("x"), col("r"), col("n"))
  }

  /** Exact-overlap verification over a (doc_a, doc_b, na, nb)
    * candidate frame: count shared shingles, keep 3c ≥ na + nb
    * (J ≥ 1/2 in integers), report the exact Jaccard. */
  private def simJoinVerify(dt: DataFrame, cand: DataFrame): DataFrame = {
    val common = cand
      .join(dt.as("xx"), col("xx.doc_id") === col("doc_a"))
      .join(dt.as("yy"),
        col("yy.doc_id") === col("doc_b") && col("yy.x") === col("xx.x"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("c"), max(col("na")).as("na"),
        max(col("nb")).as("nb"))
    common
      .where(col("c") * 3 >= col("na") + col("nb"))
      .select(col("doc_a"), col("doc_b"), col("c"), col("na"), col("nb"),
        (col("c").cast(DoubleType) /
          (col("na") + col("nb") - col("c")).cast(DoubleType)).as("jaccard"))
  }

  /** The append-incremental q192 algebra: the RESULT is exact set
    * similarity — a pure function of each pair's two shingle sets —
    * so old-old rows carry verbatim (the df-based rare-first order is
    * only a candidate-pruning heuristic; reordering prefixes cannot
    * change which pairs qualify or their (c, na, nb, jaccard)). New
    * pairs all involve a delta doc: prefixes re-rank under the
    * CURRENT df (one linear window over the slim hash frame — both
    * join sides must share one global order for the prefix theorem),
    * the candidate join pins the delta docs' prefixes on one side
    * (delta ⋈ old ∪ delta ⋈ delta — no old-old fan-out anywhere),
    * PPJoin's positional bound prunes before verification, and
    * verification touches candidate docs only. */
  private def simJoinPairsDelta(s: SparkSession, dir: String)
                               (prior: DataFrame,
                                newIds: DataFrame): DataFrame = {
    val dt = shingleHashes3(s, dir).select(col("doc_id"), col("x")).distinct()
    val pref = simJoinPrefixes(dt)
    val prefNew = pref.join(newIds, Seq("doc_id"), "left_semi")
    val prefOld = pref.join(newIds, Seq("doc_id"), "left_anti")
    val bound = least(col("a.n") - col("a.r"), col("b.n") - col("b.r")) + 1L
    val aFirst = col("a.doc_id") < col("b.doc_id")
    val collNO = prefNew.as("a")
      .join(prefOld.as("b"), col("a.x") === col("b.x"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        bound.as("ubc"),
        when(aFirst, col("a.n")).otherwise(col("b.n")).as("na"),
        when(aFirst, col("b.n")).otherwise(col("a.n")).as("nb"))
    val collNN = prefNew.as("a")
      .join(prefNew.as("b"), col("a.x") === col("b.x") && aFirst)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bound.as("ubc"), col("a.n").as("na"), col("b.n").as("nb"))
    val cand = collNO.unionByName(collNN)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("ubc")).as("ub"), max(col("na")).as("na"),
        max(col("nb")).as("nb"))
      .where(col("ub") * 3 >= col("na") + col("nb"))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"))
    simJoinVerify(dt, cand) // appendOnly: prior rows hard-link beside these
  }

  /** q197 — triangle enumeration over the near-dup graph: q73's
    * components say WHO is transitively connected; triangles say how
    * DENSELY — a dup "cluster" that is a star is hub boilerplate
    * (one template document echoed by many), a clique is a true
    * mutual-duplicate family, and the triangle census is the standard
    * way to tell them apart before a keep-one policy deletes the
    * wrong thing. Edges are the once-per-corpus `minhash_pairs_v1`
    * artifact; the plan is the DEGREE-ORIENTED compact-forward
    * enumeration (Schank & Wagner 2005 / Latapy 2008): every edge
    * orients from its lower-(degree, id) endpoint to the higher, so a
    * node's OUT-degree is O(√|E|)-bounded and the wedge self-join
    * cannot blow up on hub nodes (the id-oriented form would fan out
    * quadratically on exactly the star patterns this query exists to
    * find); a wedge closes into a triangle iff its far ends are an
    * edge (canonical low-id/high-id lookup). Each triangle has
    * exactly one node with two out-edges, so it is emitted once, then
    * normalized to id order. The oracle states WHAT — the plain
    * triple join — not HOW. */
  def dupTriangles(s: SparkSession, dir: String): DataFrame =
    dupTrianglesUnsorted(s, dir)
      .orderBy(col("doc_a"), col("doc_b"), col("doc_c"))

  /** q200 — per-node triangle support and LOCAL CLUSTERING COEFFICIENT
    * over the near-dup graph: for every graph member, its degree, how
    * many triangles it sits in, and 2T/(d(d−1)) as an integer
    * milli-ratio (exact cross-engine — no float division ambiguity).
    * This is q197's rollup into the per-document signal a curation
    * policy actually thresholds: coefficient ≈ 1000 → the doc sits in
    * a mutual-duplicate clique (safe to keep one), coefficient ≈ 0
    * with high degree → a template hub echoed by many otherwise
    * unrelated docs (cut the template, keep the docs). Triangles come
    * from [[dupTriangles]]'s degree-oriented plan; the per-node rollup
    * is one unpivot + count. */
  def dupClusteringCoeff(s: SparkSession, dir: String): DataFrame = {
    val (e, deg0) = dupGraph(s, dir)
    val deg = deg0.select(col("id").as("doc_id"), col("d").as("degree"))
    val tri = trianglesOver(e, deg0)
    val perNode = tri.select(col("doc_a").as("doc_id"))
      .unionByName(tri.select(col("doc_b").as("doc_id")))
      .unionByName(tri.select(col("doc_c").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("doc_id"), "left")
      .select(col("doc_id"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("coeff_milli",
        when(col("degree") >= 2,
          expr("(n_tri * 2000) div (degree * (degree - 1))"))
          .otherwise(lit(0L)))
      .orderBy(col("doc_id"))
  }

  /** The dup graph's (edges, degrees) — computed once and shared by
    * q197's enumeration and q200's rollup (one artifact scan, one
    * degree aggregation per plan). */
  private def dupGraph(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = minhashPairsArtifact(s, dir)
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
    val deg = e.select(col("u").as("id"))
      .unionByName(e.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    (e, deg)
  }

  /** [[dupTriangles]] without the presentation sort — q200's feed. */
  private def dupTrianglesUnsorted(s: SparkSession, dir: String): DataFrame = {
    val (e, deg) = dupGraph(s, dir)
    trianglesOver(e, deg)
  }

  /** Degree-oriented wedge enumeration over explicit (edges, degrees). */
  private def trianglesOver(e: DataFrame, deg: DataFrame): DataFrame = {
    val withDeg = e
      .join(deg.select(col("id").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("d").as("dv")), Seq("v"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"))
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .select(col("x.src").as("p"), col("x.dst").as("q"),
        col("y.dst").as("r"))
    wedges.join(e,
        least(col("q"), col("r")) === col("u") &&
          greatest(col("q"), col("r")) === col("v"))
      .select(expr("array_sort(array(p, q, r))").as("t"))
      .select(element_at(col("t"), 1).as("doc_a"),
        element_at(col("t"), 2).as("doc_b"),
        element_at(col("t"), 3).as("doc_c"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q200_dup_clustering" -> dupClusteringCoeff,
    "q197_dup_triangles" -> dupTriangles,
    "q192_sim_join_prefix" -> simJoinPrefix,
    "q183_dup_mass_curve"  -> dupMassCurve,
    "q96_containment"      -> containment,
    "q24_dedup_exact"      -> dedupExact,
    "q25_dedup_ngram_jacc" -> ngramJaccard,
    "q26_minhash_sig"      -> minhashSig,
    "q27_minhash_neardup"  -> minhashNearDup,
    "q28_simhash"          -> simhash,
    "q29_simhash_neardup"  -> simhashNearDup,
    "q54_minhash_mllib"    -> minhashMllib,
    "q175_minhash_calibration" -> minhashCalibration,
    "q177_ngram_novelty"   -> ngramNovelty,
    "q180_dedup_threshold_sweep" -> dedupThresholdSweep,
    "q182_band_recall_curve" -> bandRecallCurve,
    "q73_dedup_clusters"   -> dedupClusters,
    "q141_dedup_stats"     -> dedupStats,
    "q145_canonical_pick"  -> canonicalPick,
    "q142_lsh_audit"       -> lshAudit,
    "q173_split_repair"    -> splitRepair,
    "q76_decontaminate"    -> decontaminate,
    "q138_split_manifest"  -> splitManifest,
    "q160_split_vocab_drift" -> splitVocabDrift,
    "q139_split_leakage"   -> splitLeakage
  )

  /** Shared oracle-side CTE chain producing the q27 candidate/size/common
    * relations; q27 selects verified pairs from it, q73 closes them
    * transitively with a recursive CTE. */
  /** [[minhashCtesSql]] extended through q73's transitive closure: the
    * verified pair list, its undirected doubling, and the recursive
    * reachability relation `reach` — shared by the q73 and q141
    * oracles (callers prepend WITH RECURSIVE). */
  private def clusterReachCtesSql: String =
    s"""$minhashCtesSql,
       |pairs AS (
       |  SELECT da AS doc_a, db AS doc_b
       |  FROM common
       |  JOIN sz sa ON da = sa.doc_id
       |  JOIN sz sb ON db = sb.doc_id
       |  WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.5),
       |und AS (
       |  SELECT doc_a AS s, doc_b AS d FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT DISTINCT s AS id, s AS r FROM und
       |  UNION
       |  SELECT reach.id, u.d FROM reach JOIN und u ON u.s = reach.r)""".stripMargin

  /** Package-visible: q144's severed-edge leg rebuilds the q27 pair
    * pipeline in its oracle from the same CTE chain. */
  private[queries] def minhashCtesSql: String =
    s"""dt AS (SELECT doc_id, s AS t FROM (${Dedup.shinglesSql(3)})),
       |dtx AS (SELECT doc_id, ${Dedup.minhashTokenXSql("t")} AS x FROM dt),
       |sig AS (SELECT doc_id, ${Dedup.minhashSigAggSql} FROM dtx GROUP BY doc_id),
       |bands AS (${Dedup.minhashBandsSql}),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id),
       |common AS (
       |  SELECT da, db, count(*) AS c
       |  FROM cand
       |  JOIN dt x ON x.doc_id = da
       |  JOIN dt y ON y.doc_id = db AND y.t = x.t
       |  GROUP BY da, db)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q200_dup_clustering" ->
      s"""WITH $minhashCtesSql,
        |mp AS (
        |  SELECT da AS a, db AS b
        |  FROM common
        |  JOIN sz sa ON da = sa.doc_id
        |  JOIN sz sb ON db = sb.doc_id
        |  WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.5),
        |deg AS (
        |  SELECT doc_id, count(*)::BIGINT AS degree FROM (
        |    SELECT a AS doc_id FROM mp UNION ALL SELECT b FROM mp)
        |  GROUP BY doc_id),
        |tri AS (
        |  SELECT e1.a, e1.b, e2.b AS c3
        |  FROM mp e1
        |  JOIN mp e2 ON e1.b = e2.a
        |  JOIN mp e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pn AS (
        |  SELECT doc_id, count(*)::BIGINT AS n_tri FROM (
        |    SELECT a AS doc_id FROM tri
        |    UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c3 FROM tri)
        |  GROUP BY doc_id)
        |SELECT deg.doc_id, deg.degree,
        |       coalesce(pn.n_tri, 0) AS n_tri,
        |       CASE WHEN deg.degree >= 2
        |            THEN (coalesce(pn.n_tri, 0) * 2000)
        |                 // (deg.degree * (deg.degree - 1))
        |            ELSE 0 END AS coeff_milli
        |FROM deg LEFT JOIN pn USING (doc_id)
        |ORDER BY deg.doc_id""".stripMargin,

    "q197_dup_triangles" ->
      s"""WITH $minhashCtesSql,
        |mp AS (
        |  SELECT da AS a, db AS b
        |  FROM common
        |  JOIN sz sa ON da = sa.doc_id
        |  JOIN sz sb ON db = sb.doc_id
        |  WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.5)
        |SELECT e1.a AS doc_a, e1.b AS doc_b, e2.b AS doc_c
        |FROM mp e1
        |JOIN mp e2 ON e1.b = e2.a
        |JOIN mp e3 ON e3.a = e1.a AND e3.b = e2.b
        |ORDER BY doc_a, doc_b, doc_c""".stripMargin,

    "q192_sim_join_prefix" ->
      s"""WITH dt0 AS (SELECT doc_id, s AS t FROM (${Dedup.shinglesSql(3)})),
        |dtx AS (
        |  SELECT DISTINCT doc_id, ${Dedup.minhashTokenXSql("t")} AS x
        |  FROM dt0),
        |dft AS (SELECT x, count(*)::BIGINT AS df FROM dtx GROUP BY x),
        |sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM dtx GROUP BY doc_id),
        |pref AS (
        |  SELECT doc_id, x FROM (
        |    SELECT t.doc_id, t.x, s.n,
        |           row_number() OVER (PARTITION BY t.doc_id
        |                ORDER BY d.df, t.x) AS r
        |    FROM dtx t JOIN dft d USING (x) JOIN sz s USING (doc_id))
        |  WHERE r <= n // 2 + 1),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM pref a JOIN pref b ON a.x = b.x AND a.doc_id < b.doc_id),
        |common AS (
        |  SELECT doc_a, doc_b, count(*)::BIGINT AS c
        |  FROM cand JOIN dtx x ON x.doc_id = doc_a
        |  JOIN dtx y ON y.doc_id = doc_b AND y.x = x.x
        |  GROUP BY doc_a, doc_b)
        |SELECT m.doc_a, m.doc_b, m.c, sa.n AS na, sb.n AS nb,
        |       m.c::DOUBLE / (sa.n + sb.n - m.c)::DOUBLE AS jaccard
        |FROM common m JOIN sz sa ON m.doc_a = sa.doc_id
        |JOIN sz sb ON m.doc_b = sb.doc_id
        |WHERE m.c * 3 >= sa.n + sb.n
        |ORDER BY m.doc_a, m.doc_b""".stripMargin,

    "q175_minhash_calibration" ->
      s"""WITH $minhashCtesSql,
         |m AS (
         |  SELECT cand.da, cand.db,
         |         (${(0 until Dedup.MinHashK).map(i =>
                      s"CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END")
                      .mkString(" + ")})::BIGINT AS n_match
         |  FROM cand
         |  JOIN sig sa ON sa.doc_id = cand.da
         |  JOIN sig sb ON sb.doc_id = cand.db)
         |SELECT m.da AS doc_a, m.db AS doc_b, m.n_match,
         |       (m.n_match::DOUBLE / CAST(${Dedup.MinHashK} AS DOUBLE)) AS est_sim,
         |       coalesce(c.c, 0)::BIGINT AS n_common,
         |       (coalesce(c.c, 0)::DOUBLE
         |          / (sa.n + sb.n - coalesce(c.c, 0))) AS jaccard
         |FROM m
         |LEFT JOIN common c ON c.da = m.da AND c.db = m.db
         |JOIN sz sa ON m.da = sa.doc_id
         |JOIN sz sb ON m.db = sb.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q24_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS dup_cnt
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,

    "q182_band_recall_curve" -> {
      val bandCtes = BandConfigs.map { r =>
        s"""bands$r AS (${Dedup.minhashBandsCfgSql(r)}),
           |cand$r AS (
           |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
           |  FROM bands$r a JOIN bands$r b
           |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)"""
          .stripMargin
      }
      val cfgRows = BandConfigs.map { r =>
        s"""SELECT $r AS rows_per_band,
           |       (SELECT count(*) FROM cand$r) AS n_candidates,
           |       (SELECT count(*) FROM cand$r c JOIN truth t
           |          ON c.da = t.da AND c.db = t.db) AS n_captured"""
          .stripMargin
      }
      s"""WITH dt AS (SELECT doc_id, s AS t FROM (${Dedup.shinglesSql(3)})),
         |dtx AS (SELECT doc_id, ${Dedup.minhashTokenXSql("t")} AS x FROM dt),
         |sig AS (SELECT doc_id, ${Dedup.minhashSigAggSql} FROM dtx GROUP BY doc_id),
         |sz AS (SELECT doc_id, count(*) AS n FROM dt GROUP BY doc_id),
         |truth AS (
         |  SELECT p.da, p.db FROM (
         |    SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
         |    FROM dt a JOIN dt b ON a.t = b.t AND a.doc_id < b.doc_id
         |    GROUP BY 1, 2) p
         |  JOIN sz sa ON p.da = sa.doc_id
         |  JOIN sz sb ON p.db = sb.doc_id
         |  WHERE 3 * p.c >= sa.n + sb.n),
         |${bandCtes.mkString(",\n")}
         |SELECT rows_per_band::BIGINT AS rows_per_band,
         |       (${Dedup.MinHashK} // rows_per_band)::BIGINT AS n_bands,
         |       n_candidates::BIGINT AS n_candidates,
         |       (SELECT count(*) FROM truth)::BIGINT AS n_truth,
         |       n_captured::BIGINT AS n_captured,
         |       (CASE WHEN (SELECT count(*) FROM truth) = 0 THEN 0
         |             ELSE (n_captured * 1000) // (SELECT count(*) FROM truth)
         |        END)::BIGINT AS recall_milli
         |FROM (${cfgRows.mkString("\nUNION ALL\n")})
         |ORDER BY rows_per_band""".stripMargin
    },

    "q180_dedup_threshold_sweep" ->
      s"""WITH $minhashCtesSql,
         |pairs AS (
         |  SELECT common.da, common.db, common.c, sa.n AS na, sb.n AS nb
         |  FROM common
         |  JOIN sz sa ON common.da = sa.doc_id
         |  JOIN sz sb ON common.db = sb.doc_id),
         |taus AS (SELECT unnest([300, 400, 500, 600, 700, 800]) AS tau_milli),
         |adm AS (
         |  SELECT t.tau_milli, p.da, p.db
         |  FROM pairs p, taus t
         |  WHERE p.c * 1000 >= t.tau_milli * (p.na + p.nb - p.c)),
         |np AS (SELECT tau_milli, count(*) AS n_pairs FROM adm GROUP BY tau_milli),
         |nd AS (
         |  SELECT tau_milli, count(*) AS n_docs FROM (
         |    SELECT DISTINCT tau_milli, d FROM (
         |      SELECT tau_milli, da AS d FROM adm
         |      UNION ALL
         |      SELECT tau_milli, db AS d FROM adm))
         |  GROUP BY tau_milli)
         |SELECT t.tau_milli::BIGINT AS tau_milli,
         |       coalesce(np.n_pairs, 0)::BIGINT AS n_pairs,
         |       coalesce(nd.n_docs, 0)::BIGINT AS n_docs
         |FROM taus t
         |LEFT JOIN np ON np.tau_milli = t.tau_milli
         |LEFT JOIN nd ON nd.tau_milli = t.tau_milli
         |ORDER BY tau_milli""".stripMargin,

    "q177_ngram_novelty" ->
      s"""WITH sh AS (${Dedup.shinglesSql(3)}),
         |dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
         |SELECT sh.doc_id,
         |       count(*)::BIGINT AS n_shingles,
         |       CAST(sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_shared,
         |       CAST(((count(*) - sum(CASE WHEN d.df >= 2 THEN 1 ELSE 0 END))
         |             * 1000) // count(*) AS BIGINT) AS novelty_milli
         |FROM sh JOIN dfreq d ON d.s = sh.s
         |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin,

    "q183_dup_mass_curve" ->
      s"""WITH sh AS (${Dedup.shinglesSql(3)}),
         |dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
         |b AS (SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS df_bucket,
         |             count(*)::BIGINT AS n_shingles,
         |             CAST(sum(df) AS BIGINT) AS n_occ
         |      FROM dfreq GROUP BY 1),
         |t AS (SELECT CAST(sum(n_occ) AS BIGINT) AS tot FROM b)
         |SELECT df_bucket, n_shingles, n_occ,
         |       CAST((n_occ * 1000) // tot AS BIGINT) AS share_milli
         |FROM b, t ORDER BY df_bucket""".stripMargin,

    "q25_dedup_ngram_jacc" ->
      s"""WITH sh AS (${Dedup.shinglesSql(3)}),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, c::DOUBLE / (sa.n + sb.n - c) AS jaccard
         |FROM pairs
         |JOIN sz sa ON doc_a = sa.doc_id
         |JOIN sz sb ON doc_b = sb.doc_id
         |WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q26_minhash_sig" ->
      s"""WITH dt AS (${Dedup.tokenSetSql}),
         |dtx AS (SELECT doc_id, ${Dedup.minhashTokenXSql("t")} AS x FROM dt),
         |sig AS (SELECT doc_id, ${Dedup.minhashSigAggSql} FROM dtx GROUP BY doc_id)
         |SELECT doc_id, concat_ws('|', ${(0 until Dedup.MinHashK).map(i => s"h$i").mkString(", ")}) AS sig
         |FROM sig ORDER BY doc_id""".stripMargin,

    "q27_minhash_neardup" ->
      s"""WITH $minhashCtesSql
         |SELECT da AS doc_a, db AS doc_b, c::DOUBLE / (sa.n + sb.n - c) AS jaccard
         |FROM common
         |JOIN sz sa ON da = sa.doc_id
         |JOIN sz sb ON db = sb.doc_id
         |WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q73_dedup_clusters" ->
      s"""WITH RECURSIVE $clusterReachCtesSql
         |SELECT id AS doc_id, min(r) AS comp
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,

    "q173_split_repair" ->
      s"""WITH RECURSIVE $clusterReachCtesSql,
         |comp AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
         |alldocs AS (
         |  SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS comp
         |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
         |sp AS (
         |  SELECT doc_id, comp,
         |    ('0x' || substr(md5('split|' || doc_id), 1, 15))::BIGINT % 10 AS bk1,
         |    ('0x' || substr(md5('split|' || comp), 1, 15))::BIGINT % 10 AS bk2
         |  FROM alldocs)
         |SELECT doc_id, comp,
         |  CASE WHEN bk1 < 8 THEN 'train' WHEN bk1 = 8 THEN 'val'
         |       ELSE 'test' END AS old_split,
         |  CASE WHEN bk2 < 8 THEN 'train' WHEN bk2 = 8 THEN 'val'
         |       ELSE 'test' END AS new_split,
         |  (CASE WHEN (CASE WHEN bk1 < 8 THEN 'train' WHEN bk1 = 8 THEN 'val'
         |                   ELSE 'test' END) <>
         |             (CASE WHEN bk2 < 8 THEN 'train' WHEN bk2 = 8 THEN 'val'
         |                   ELSE 'test' END)
         |        THEN 1 ELSE 0 END)::BIGINT AS moved
         |FROM sp ORDER BY doc_id""".stripMargin,

    "q142_lsh_audit" ->
      s"""WITH $minhashCtesSql,
         |ep AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
         |  FROM dt a JOIN dt b ON a.t = b.t AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |ex AS (
         |  SELECT doc_a, doc_b, (20 * c) // (sa.n + sb.n - c) AS j_bucket
         |  FROM ep
         |  JOIN sz sa ON doc_a = sa.doc_id
         |  JOIN sz sb ON doc_b = sb.doc_id
         |  WHERE 3 * c >= sa.n + sb.n),
         |fnd AS (
         |  SELECT da AS doc_a, db AS doc_b
         |  FROM common
         |  JOIN sz sa ON da = sa.doc_id
         |  JOIN sz sb ON db = sb.doc_id
         |  WHERE 3 * c >= sa.n + sb.n)
         |SELECT j_bucket, count(*)::BIGINT AS n_pairs,
         |       sum(CASE WHEN f.doc_a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         |         AS n_found
         |FROM ex LEFT JOIN fnd f
         |  ON ex.doc_a = f.doc_a AND ex.doc_b = f.doc_b
         |GROUP BY j_bucket ORDER BY j_bucket""".stripMargin,

    "q141_dedup_stats" ->
      s"""WITH RECURSIVE $clusterReachCtesSql,
         |lab AS (
         |  SELECT d.doc_id, d.n_chars, coalesce(r.comp, d.doc_id) AS comp
         |  FROM documents d
         |  LEFT JOIN (SELECT id, min(r) AS comp FROM reach GROUP BY id) r
         |    ON d.doc_id = r.id),
         |pc AS (
         |  SELECT comp, count(*)::BIGINT AS sz,
         |         CAST(sum(n_chars) AS BIGINT) AS chars_total,
         |         CAST(sum(CASE WHEN doc_id <> comp THEN n_chars ELSE 0 END)
         |              AS BIGINT) AS chars_removed
         |  FROM lab GROUP BY comp)
         |SELECT sz AS cluster_size, count(*)::BIGINT AS n_clusters,
         |       CAST(sum(sz) AS BIGINT) AS n_docs,
         |       CAST(sum(sz - 1) AS BIGINT) AS dup_docs,
         |       CAST(sum(chars_total) AS BIGINT) AS chars_total,
         |       CAST(sum(chars_removed) AS BIGINT) AS chars_removed
         |FROM pc GROUP BY sz ORDER BY cluster_size""".stripMargin,

    "q145_canonical_pick" ->
      s"""WITH RECURSIVE $clusterReachCtesSql,
         |lab AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
         |tk AS (
         |  SELECT doc_id,
         |         len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tok
         |  FROM documents),
         |m AS (
         |  SELECT lab.comp, tk.doc_id, tk.n_tok,
         |         tk.n_tok * 8589934592 - tk.doc_id AS pk
         |  FROM lab JOIN tk ON lab.id = tk.doc_id)
         |SELECT comp, count(*)::BIGINT AS sz,
         |       arg_max(doc_id, pk) AS keep_doc,
         |       arg_max(n_tok, pk) AS keep_n_tok,
         |       sum(n_tok)::BIGINT AS tok_total,
         |       (sum(n_tok) - arg_max(n_tok, pk))::BIGINT AS tok_dropped,
         |       (CASE WHEN arg_max(doc_id, pk) = comp THEN 1 ELSE 0 END)::BIGINT
         |         AS minid_agrees
         |FROM m GROUP BY comp ORDER BY comp""".stripMargin,

    "q160_split_vocab_drift" ->
      """WITH d AS (
        |  SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
        |              ELSE 'test' END AS split, t AS term
        |  FROM (
        |    SELECT ('0x' || substr(md5('split|' || doc_id), 1, 15))::BIGINT
        |             % 10 AS b,
        |           unnest(string_split_regex(trim(text), '\s+')) AS t
        |    FROM documents)
        |  WHERE t <> ''),
        |c AS (
        |  SELECT term,
        |    sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)::BIGINT AS n_train,
        |    sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END)::BIGINT AS n_val,
        |    sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END)::BIGINT AS n_test
        |  FROM d GROUP BY term),
        |tot AS (
        |  SELECT sum(n_train)::BIGINT AS tot_train,
        |         sum(n_val)::BIGINT AS tot_val,
        |         sum(n_test)::BIGINT AS tot_test
        |  FROM c)
        |SELECT term, n_train, n_val, n_test, tot_train, tot_val, tot_test
        |FROM c CROSS JOIN tot ORDER BY term""".stripMargin,
    "q138_split_manifest" ->
      """WITH b AS (
        |  SELECT lang, source, n_chars,
        |         ('0x' || substr(md5('split|' || doc_id), 1, 15))::BIGINT % 10
        |           AS bk
        |  FROM documents)
        |SELECT lang, source,
        |       CASE WHEN bk < 8 THEN 'train' WHEN bk = 8 THEN 'val'
        |            ELSE 'test' END AS split,
        |       count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS n_chars
        |FROM b GROUP BY 1, 2, 3
        |ORDER BY lang, source, split""".stripMargin,

    "q139_split_leakage" ->
      s"""WITH sh AS (${Dedup.shinglesSql(8)}),
         |sb AS (
         |  SELECT doc_id, s,
         |         CASE WHEN bk < 8 THEN 1 WHEN bk = 8 THEN 2 ELSE 4 END AS bit
         |  FROM (
         |    SELECT doc_id, s,
         |           ('0x' || substr(md5('split|' || doc_id), 1, 15))::BIGINT
         |             % 10 AS bk
         |    FROM sh)),
         |m AS (SELECT s, bit_or(bit) AS mask FROM sb GROUP BY s),
         |pc AS (
         |  SELECT count(*)::BIGINT AS n_grams,
         |    sum(CASE WHEN mask & 3 = 3 THEN 1 ELSE 0 END)::BIGINT
         |      AS n_train_val,
         |    sum(CASE WHEN mask & 5 = 5 THEN 1 ELSE 0 END)::BIGINT
         |      AS n_train_test,
         |    sum(CASE WHEN mask & 6 = 6 THEN 1 ELSE 0 END)::BIGINT
         |      AS n_val_test
         |  FROM m),
         |lk AS (
         |  SELECT count(DISTINCT sb.doc_id)::BIGINT AS n_leaky_test_docs
         |  FROM sb JOIN m USING (s) WHERE sb.bit = 4 AND m.mask & 1 = 1)
         |SELECT pc.*, lk.* FROM pc, lk""".stripMargin,

    "q76_decontaminate" ->
      s"""WITH plant AS (
         |  SELECT array_to_string(
         |    string_split_regex(trim(text), '\\s+')[1:12], ' ') AS plant
         |  FROM documents WHERE doc_id = 0),
         |aug AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 11 = 1
         |         THEN text || ' ' || (SELECT plant FROM plant)
         |         ELSE text END AS text
         |  FROM documents),
         |sh AS (${Dedup.shinglesSql(8, "aug")}),
         |ev AS (SELECT doc_id AS eval_doc, s FROM sh WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0),
         |pairs AS (
         |  SELECT DISTINCT tr.doc_id AS train_doc, ev.eval_doc
         |  FROM tr JOIN ev ON tr.s = ev.s)
         |SELECT train_doc, count(*) AS n_eval_hits, min(eval_doc) AS first_eval
         |FROM pairs GROUP BY train_doc ORDER BY train_doc""".stripMargin,

    "q96_containment" ->
      s"""WITH sh AS (${Dedup.shinglesSql(8)}),
         |sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id),
         |kept AS (
         |  SELECT doc_id, s FROM sh
         |  WHERE s NOT IN (
         |    SELECT s FROM sh GROUP BY s
         |    HAVING count(*) > greatest(5, CAST(ceil(
         |      0.01 * (SELECT count(*) FROM documents)) AS BIGINT)))),
         |common AS (
         |  SELECT a.doc_id AS inner_doc, b.doc_id AS outer_doc,
         |         count(*)::BIGINT AS common
         |  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id <> b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT c.inner_doc, c.outer_doc, c.common, s.n AS n_inner,
         |       c.common::DOUBLE / s.n::DOUBLE AS containment
         |FROM common c JOIN sz s ON s.doc_id = c.inner_doc
         |WHERE c.common::DOUBLE / s.n::DOUBLE >= 0.6
         |ORDER BY c.inner_doc, c.outer_doc""".stripMargin,

    "q28_simhash" ->
      s"""WITH tc AS (
         |  SELECT doc_id, t, count(*) AS cnt FROM (
         |    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
         |    FROM documents) WHERE t <> '' GROUP BY doc_id, t),
         |td AS (${Dedup.simhashDigitsSql}),
         |s AS (SELECT doc_id, ${Dedup.simhashSumsSql} FROM td GROUP BY doc_id)
         |SELECT doc_id, ${Dedup.simhashAssembleSql} AS simhash
         |FROM s ORDER BY doc_id""".stripMargin,

    "q29_simhash_neardup" ->
      s"""WITH tc AS (
         |  SELECT doc_id, t, count(*) AS cnt FROM (
         |    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
         |    FROM documents) WHERE t <> '' GROUP BY doc_id, t),
         |td AS (${Dedup.simhashDigitsSql}),
         |s AS (SELECT doc_id, ${Dedup.simhashSumsSql} FROM td GROUP BY doc_id),
         |fp AS (SELECT doc_id, ${Dedup.simhashAssembleSql} AS simhash FROM s),
         |bands AS (
         |${(0 until 4).map(j =>
            s"  SELECT doc_id, simhash, $j AS band, ${Dedup.simhashBandSql("simhash", j)} AS bv FROM fp")
            .mkString("\n  UNION ALL\n")}),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM cand
         |WHERE hamming <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
  )
}
