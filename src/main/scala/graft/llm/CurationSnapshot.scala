package graft.llm

import java.util.concurrent.ConcurrentHashMap

import graft.ArtifactStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PINNED curation codebook as managed state (r8 verdict item 4:
  * "a drift gauge but no re-freeze policy"). The curation clusterings
  * (q77/q101/q102) and stream-start state (StreamCentroid) deliberately
  * cluster on a FROZEN snapshot rather than the live trained book, so
  * their keep/drop verdicts are stable across retrains — but "frozen"
  * must not mean "forever": q159 measures how far the corpus has moved
  * from the snapshot, and this object is where that number becomes an
  * ACTION.
  *
  * The snapshot lives in the [[ArtifactStore]] keyed by the embeddings
  * fingerprint, seeded on first touch from the historical pin
  * ([[IvfCodebook]]'s literals); its consumers' DuckDB oracles read the
  * SAME parquet (glob + fingerprint filter), which is what keeps
  * q77/q101/q102/q159 exact-oracle-able on BOTH sides of a re-freeze —
  * the verdicts change when the pin changes, but both engines read the
  * same pin.
  *
  * RE-FREEZE POLICY (code, not prose): re-freeze when the RMS per-dim
  * displacement between the snapshot and the freshly trained serve book
  * exceeds [[RefreezeRms]] — at that point the snapshot's cells no
  * longer describe the corpus's semantic regions and "stable verdicts"
  * have become "stale verdicts" (clusters capped/pruned against
  * geometry that is no longer there). Below the threshold, verdict
  * stability wins: a re-freeze relabels every cached curation decision
  * downstream, so it must be rarer than retrains. [[refreezeIfDrifted]]
  * is the janitor-job entry point (same explicit-invocation posture as
  * compaction and GC: swapping the pin under a live pipeline is an
  * operator's call, so nothing re-freezes implicitly mid-query).
  */
object CurationSnapshot {

  val Key = s"curation_snapshot_c${IvfCodebook.Cells}_v1"

  /** Re-freeze when sqrt(mean over all (cell, dim) of (snap−trained)²)
    * exceeds this — 0.02 against this corpus family's ~0.1-magnitude
    * components means cells have moved a fifth of their scale: capped
    * clusters (q77), SemDeDup balls (q101), and the Lloyd demo (q102)
    * are then measuring yesterday's geometry. */
  val RefreezeRms = 0.02

  private val memo = new ConcurrentHashMap[String, Array[Array[Double]]]()

  private def seedFrame(s: SparkSession): DataFrame = {
    import s.implicits._
    (for {
      k <- IvfCodebook.centroids.indices
      d <- 0 until VectorOps.Dim
    } yield (k.toLong, (d + 1).toLong, IvfCodebook.centroids(k)(d)))
      .toDF("cid", "dim", "cval")
  }

  /** The snapshot artifact rows (cid, dim, cval) — first touch pins the
    * historical [[IvfCodebook]] literals. */
  def frame(s: SparkSession, dir: String): DataFrame = {
    val fp = ArtifactStore.embeddingsFp(s, dir)
    ArtifactStore.parquetOnce(s, Key, fp)(seedFrame(s))
      .select(col("cid"), col("dim"), col("cval"))
  }

  /** The pinned centroids as model state — collected from the published
    * parquet (the exact doubles the oracles read), memoized per
    * (dir, fp). */
  def centroids(s: SparkSession, dir: String): Array[Array[Double]] = {
    val fp = ArtifactStore.embeddingsFp(s, dir)
    memo.computeIfAbsent(s"$dir|$fp", _ => {
      val cents = Array.ofDim[Double](IvfCodebook.Cells, VectorOps.Dim)
      frame(s, dir).collect().foreach { r =>
        cents(r.getLong(0).toInt)(r.getLong(1).toInt - 1) = r.getDouble(2)
      }
      cents
    })
  }

  /** Oracle CTE: the pinned centroids as (cid, cv DOUBLE[]) from the
    * SAME published parquet (ServeBooks' glob+fingerprint idiom). */
  def centsCteSql(alias: String): String =
    s"""$alias AS (
       |  SELECT CAST(cid AS BIGINT) AS cid, list(cval ORDER BY dim) AS cv
       |  FROM read_parquet('${ArtifactStore.sqlGlob(Key)}')
       |  WHERE fp = ${ArtifactStore.embeddingsFpSql}
       |  GROUP BY cid)""".stripMargin

  /** RMS per-dim displacement between the snapshot and the trained
    * serve book — the scalar form of q159's per-cell gauge (both read
    * the same published artifacts; 2×2,048 doubles of driver-side
    * arithmetic). */
  def driftRms(s: SparkSession, dir: String): Double = {
    val snap = centroids(s, dir)
    val trained = ServeBooks.coarse(s, dir)
    var ss = 0.0
    var n = 0
    for (k <- snap.indices; d <- snap(k).indices) {
      val dd = snap(k)(d) - trained(k)(d)
      ss += dd * dd; n += 1
    }
    math.sqrt(ss / n)
  }

  /** Republish the pin FROM the trained serve book. */
  def refreeze(s: SparkSession, dir: String): Unit =
    repin(s, dir, ServeBooks.coarse(s, dir))

  /** Publish an explicit pin (re-freeze proper, or an operator
    * override / rollback to a recorded book). */
  def repin(s: SparkSession, dir: String,
            cents: Array[Array[Double]]): Unit = {
    import s.implicits._
    val fp = ArtifactStore.embeddingsFp(s, dir)
    val rows = (for {
      k <- cents.indices; d <- cents(k).indices
    } yield (k.toLong, (d + 1).toLong, cents(k)(d)))
      .toDF("cid", "dim", "cval")
    ArtifactStore.invalidate(Key, fp)
    ArtifactStore.parquetOnce(s, Key, fp)(rows)
    memo.remove(s"$dir|$fp")
  }

  /** The policy applied: re-freeze iff drift exceeds [[RefreezeRms]].
    * Returns true when the pin moved. */
  def refreezeIfDrifted(s: SparkSession, dir: String,
                        threshold: Double = RefreezeRms): Boolean = {
    if (driftRms(s, dir) > threshold) { refreeze(s, dir); true }
    else false
  }
}
