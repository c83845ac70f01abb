package graft.sources

import graft.ArtifactStore
import graft.llm.ServeBooks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The takedown cascade for the EMBEDDINGS side (r8 verdict item 3) —
  * [[TakedownApply]] erases documents; this erases vectors. A deletion
  * request against an embedding must do two things:
  *
  *  1. **Stop serving it immediately.** The corpus parquet itself may
  *     be immutable (a snapshot, a vendor drop), so exclusion lives in
  *     a persistent TOMBSTONE SET keyed by the embeddings fingerprint
  *     — `vec_tombstones_v1` in the [[ArtifactStore]] — that the serve
  *     queries (q55/q64/q113/q164) anti-join and their DuckDB oracles
  *     mirror with a `NOT IN` over the same parquet. The set is
  *     ensured to EXIST (with a `-1` sentinel row no real vec_id can
  *     match) so both engines always have a file to read.
  *  2. **Kill the model state it shaped.** Every embeddings-
  *     fingerprinted artifact family — coarse book, PQ books, residual
  *     books, code indexes, int8 scales — is invalidated by
  *     fingerprint; the next serve RETRAINS/re-encodes from the corpus
  *     MINUS the tombstone set ([[ServeBooks]] and
  *     [[graft.llm.PqTrain]] read through [[servedEmbeddings]]), so
  *     post-takedown books no longer embed the deleted vectors'
  *     geometry and rebuilt code indexes no longer carry their rows.
  *
  * Idempotence: a second `flag` with the same ids adds nothing and
  * invalidates nothing (erasure pipelines re-run on failure). Scale
  * posture: the tombstone set is bounded by deletion volume, not
  * corpus size — it broadcasts; the invalidation is O(#families) file
  * operations; the retrain cost is the price of model-state erasure
  * and is deferred to the next build (serving stays correct meanwhile
  * because the anti-join filters the serve output directly).
  */
object VecTakedown {

  val Key = "vec_tombstones_v1"

  /** No real vec_id is negative; the sentinel keeps the published
    * artifact non-empty so `read_parquet` on the glob always succeeds
    * in both engines. */
  val Sentinel = -1L

  /** The embeddings-fingerprinted artifact families a vector deletion
    * invalidates (books, scales, and the int8 code index — model state
    * derived from the corpus's vector values and keyed directly by
    * the corpus fingerprint). The residual-PQ code index keys its
    * generations by corpus ⊗ books and is invalidated by enumeration —
    * content-scoped ([[graft.llm.ServeBooks.codesGenerationsContaining]])
    * in [[flag]], current-corpus-scoped
    * ([[graft.llm.ServeBooks.pqResCodesFpsFor]]) in [[reset]]. */
  def embArtifactKeys: Seq[String] = Seq(
    ServeBooks.CoarseKey, ServeBooks.PqKey, ServeBooks.PqResKey,
    ServeBooks.Int8ScalesKey, ServeBooks.Int8CodesKey) ++
    // the audit-tier arm top-K stores (r17): derived from the corpus
    // minus THIS tombstone set through the books above, so they die in
    // the same cascade — a flag/reset must kill the stored lists with
    // the model state or a later audit would serve pre-takedown ranks
    graft.queries.SimilarityQueries.AnnTopkKeys

  /** Erase every pre-v2 codes generation (raw-fp ids, never rebuilt,
    * read by nothing since the v2 migration): invalidating only the
    * CURRENT corpus fingerprint would miss generations parked at older
    * fps — the common migrated-store state, since an appended corpus
    * moves the fp and the v1 family never publishes again (r12 review
    * finding). Dead state of a dead key: sweep it all. */
  private def dropLegacyCodes(): Unit =
    ArtifactStore.invalidateAllFps(ServeBooks.PqResCodesKeyLegacyV1)

  private def sentinelFrame(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(Sentinel).toDF("vec_id")
  }

  /** The corpus's tombstone set (vec_id rows, sentinel included) —
    * ensured to exist on first read. */
  def tombstones(s: SparkSession, dir: String): DataFrame = {
    val fp = ArtifactStore.embeddingsFp(s, dir)
    ArtifactStore.parquetOnce(s, Key, fp)(sentinelFrame(s))
      .select(col("vec_id"))
  }

  /** The flagged ids only (sentinel dropped) — audit surface. */
  def flagged(s: SparkSession, dir: String): Seq[Long] = {
    import s.implicits._
    tombstones(s, dir).where(col("vec_id") =!= Sentinel)
      .as[Long].collect().toSeq.sorted
  }

  /** `embeddings` minus the tombstone set — the frame every trainer
    * and index build reads, so retrained model state excludes deleted
    * vectors. The tombstone side is bounded by deletion volume and
    * broadcasts; with no flags this is an anti-join against the
    * 1-row sentinel. */
  def servedEmbeddings(s: SparkSession, dir: String): DataFrame =
    graft.Tables.embeddings(s, dir)
      .join(broadcast(tombstones(s, dir)), Seq("vec_id"), "left_anti")

  /** SQL twin of the serve-side exclusion: the predicate the four
    * serve oracles apply to their base embeddings CTE. */
  def notTombstonedSql: String =
    s"""vec_id NOT IN (SELECT vec_id
       |    FROM read_parquet('${ArtifactStore.sqlGlob(Key)}')
       |    WHERE fp = ${ArtifactStore.embeddingsFpSql})""".stripMargin

  /** Flag vectors for deletion: republish the tombstone set with the
    * new ids and invalidate every embeddings-fingerprinted model/state
    * artifact (plus the in-JVM book memos — the fingerprint does not
    * change, so stale memo entries must be dropped explicitly).
    * Returns the NEWLY flagged count; 0 means the pass was a no-op and
    * nothing was invalidated. */
  def flag(s: SparkSession, dir: String, vecIds: Seq[Long]): Long = {
    val fp = ArtifactStore.embeddingsFp(s, dir)
    import s.implicits._
    val cur = tombstones(s, dir).as[Long].collect().toSet
    val add = vecIds.distinct.filterNot(cur)
    if (add.isEmpty) return 0L
    val merged = (cur ++ add).toSeq.sorted.toDF("vec_id")
    ArtifactStore.invalidate(Key, fp)
    ArtifactStore.parquetOnce(s, Key, fp)(merged)
    embArtifactKeys.foreach(ArtifactStore.invalidate(_, fp))
    // codes generations key on corpus ⊗ books: enumerate BY CONTENT —
    // every published generation whose certificate/data contains a
    // flagged id (r12 ADVICE, medium) — and invalidate each. Current-fp
    // scoping would miss generations parked at pre-append fps of this
    // deployment, leaving the victims' encoded geometry on disk; a
    // current-corpus generation NOT containing the ids was built after
    // they were tombstoned and rightly survives. The next serve
    // re-encodes from the corpus minus the tombstones.
    ServeBooks.codesGenerationsContaining(s, dir, add)
      .foreach(ArtifactStore.invalidate(ServeBooks.PqResCodesKey, _))
    dropLegacyCodes()
    ServeBooks.invalidateMemos(dir, fp)
    // serve-cells generations hold RAW vector values and may be pinned
    // by a live serve stream: scrub the rows in place (every published
    // generation CONTAINING them, pre-append fps included) instead of
    // invalidating — ServeBooks.scrubAnnCells explains why deletion
    // would be wrong.
    ServeBooks.scrubAnnCells(s, dir, add)
    add.size.toLong
  }

  /** Retract ALL flags for the corpus: republish the sentinel-only set
    * and invalidate the same families (they were built minus the old
    * tombstones, so they must rebuild from the full corpus). Also the
    * spec-cleanup path. */
  def reset(s: SparkSession, dir: String): Unit = {
    val fp = ArtifactStore.embeddingsFp(s, dir)
    ArtifactStore.invalidate(Key, fp)
    ArtifactStore.parquetOnce(s, Key, fp)(sentinelFrame(s))
    embArtifactKeys.foreach(ArtifactStore.invalidate(_, fp))
    ServeBooks.pqResCodesFpsFor(s, dir)
      .foreach(ArtifactStore.invalidate(ServeBooks.PqResCodesKey, _))
    dropLegacyCodes()
    ServeBooks.invalidateMemos(dir, fp)
    // scrubbed serve-cells rows cannot be restored by another scrub:
    // retraction drops this corpus's generations so the next serve
    // rebuilds from the full corpus with the retrained book (no stream
    // should outlive a full retraction — it is the spec-cleanup path).
    ServeBooks.annCellsFpsFor(s, dir)
      .foreach(ArtifactStore.invalidate(ServeBooks.AnnCellsKey, _))
  }
}
