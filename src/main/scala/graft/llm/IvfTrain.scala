package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DISTRIBUTED IVF coarse-centroid training: q148 trains the PQ
  * residual books distributed, and this trains the coarse lists. The
  * serve queries (q55/q64/q113) read their coarse book from
  * [[ServeBooks]], which runs THIS trainer at the serve geometry and
  * publishes the result to the corpus-fingerprinted ArtifactStore —
  * the train→serve loop is closed in-engine (r7 verdict item 1). It is [[PqTrain.train]] at the degenerate geometry (one
  * subspace spanning the full [[VectorOps.Dim]] dimensions): same
  * first-K init, same exact DECIMAL(18,9) element-sum discipline that
  * makes float k-means independent of partitioning and scheduling, same
  * scale-9 HALF_UP driver-side mean, same min-id tie break and
  * frozen-empty-cell convention — so one trainer, proven once, covers
  * both halves of the ANN stack.
  *
  * Scale shape: identical to q148's (one persisted scan, per round one
  * row-local assignment pass + ONE map-side-combined aggregation into
  * ≤ K rows of decimal sums; only model state reaches the driver,
  * broadcast is K·Dim doubles — 8 KiB).
  */
object IvfTrain {

  val K = 16
  val Rounds = 10

  /** q154 — the trained coarse codebook in flat comparable form: one
    * row per (list, dim) with the final-round member count. Rows-only
    * by design (iterative merge loop — q131/q148's precedent);
    * exactness is proven by IvfTrainSpec's independent recomputation.
    */
  def ivfTrainQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (books, counts) = PqTrain.train(s, dir, Rounds, 1, VectorOps.Dim, K)
    (for {
      k <- 0 until K; d <- 0 until VectorOps.Dim
    } yield (k.toLong, counts(0)(k), (d + 1).toLong, books(0)(k)(d)))
      .toDF("list_id", "n_members", "dim", "cval")
      .orderBy(col("list_id"), col("dim"))
  }
}
