package graft.llm

import java.util.concurrent.ConcurrentHashMap

import graft.ArtifactStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The BPE train→apply loop, closed (ServeBooks' pattern applied to the
  * last frozen-literal model): q99 applies a merge table TRAINED
  * IN-ENGINE by [[BpeTrain.train]] at the serve depth and published to
  * the documents-fingerprinted ArtifactStore — a new corpus retrains
  * transparently, a rerun reuses the published table, and the frozen
  * [[Bpe.merges]] literals remain only as the pinned snapshot
  * BpeTrainSpec proves the trainer reproduces.
  *
  * The collected table is MODEL STATE (≤ [[Rounds]] string pairs, ~1
  * KiB); it ships inside the plan as the `graft_bpe_tbl` expression's
  * spec literal, so the apply stays whole-stage-codegen'd and
  * cluster-correct (the table travels with the serialized plan, not
  * via JVM statics).
  */
object BpeServe {

  /** Serve depth — the frozen snapshot's 64 merges (BpeTrainSpec's
    * prefix-parity evidence links trainer and snapshot at this data). */
  val Rounds = 64

  /** Key versions the recipe (ArtifactStore's staleness contract). */
  val Key = s"bpe_merges_r${Rounds}_v1"

  private val memo = new ConcurrentHashMap[String, Vector[(String, String)]]()

  /** The published merge-table artifact rows (rnk, lhs, rhs, cnt). */
  def mergesFrame(s: SparkSession, dir: String): DataFrame = {
    val fp = ArtifactStore.documentsFp(s, dir)
    ArtifactStore.parquetOnce(s, Key, fp) {
      import s.implicits._
      BpeTrain.train(s, dir, Rounds).zipWithIndex
        .map { case ((a, b, c), i) => ((i + 1).toLong, a, b, c) }
        .toDF("rnk", "lhs", "rhs", "cnt")
    }.select(col("rnk"), col("lhs"), col("rhs"), col("cnt"))
  }

  /** The trained table in training order, collected once per corpus. */
  def merges(s: SparkSession, dir: String): Vector[(String, String)] = {
    val fp = ArtifactStore.documentsFp(s, dir)
    memo.computeIfAbsent(s"$dir|$fp", _ =>
      mergesFrame(s, dir).orderBy(col("rnk"))
        .select(col("lhs"), col("rhs")).collect()
        .map(r => (r.getString(0), r.getString(1))).toVector)
  }

  /** The plan-literal wire form for `graft_bpe_tbl`. */
  def spec(s: SparkSession, dir: String): String =
    Bpe.toSpec(merges(s, dir))
}
