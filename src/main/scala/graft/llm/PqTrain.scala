package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** DISTRIBUTED product-quantization codebook training (Jégou et al.
  * 2011) — the training half of the q64/q113 ANN stack; [[ServeBooks]]
  * publishes its output as the corpus-fingerprinted artifact the serve
  * queries and their oracles read.
  * Lloyd k-means per contiguous subspace, all M subspaces trained in
  * the SAME synchronous rounds: one job per round covers every
  * subspace, not M sequential loops.
  *
  * Determinism across engines, partitionings, and cluster sizes — the
  * property float k-means normally lacks — comes from the q102 dsum
  * idiom: member-vector element sums ride DECIMAL(18,9) (exact,
  * associative; float addition order would make the trained codebook
  * depend on task scheduling), and the mean division happens once per
  * round on the driver in BigDecimal with a fixed scale/rounding.
  * Assignment distances are row-local double arithmetic in fixed
  * dimension order — deterministic everywhere — with ties to the
  * smallest centroid id, and an emptied cell keeps its previous
  * centroid (the script's convention).
  *
  * Scale shape: the vectors are scanned once into a persisted
  * (vec_id, subspace, subvector) relation; each round is a row-local
  * assignment pass over it plus ONE map-side-combined aggregation into
  * ≤ M·K rows of (count, SubDim decimal sums) — the only rows that
  * ever reach the driver (model state, BpeTrain's discipline; never
  * corpus data). Broadcast model size is M·K·SubDim doubles — 8 KiB —
  * regardless of corpus size.
  */
object PqTrain {

  val M = 8        // subspaces
  val SubDim = 8   // dims per subspace (M * SubDim = VectorOps.Dim)
  val K = 16       // centroids per subspace
  // 10 synchronous rounds: measured on the sf0.1 embeddings, rounds
  // past 10 buy < 0.3% SSE each (the first 4 buy 24%) while every
  // round costs one fixed-overhead cluster job — the classic
  // synchronous-iteration economics; `rounds` stays a parameter.
  val Rounds = 10

  /** Mean with the fixed driver-side contract: scale 9, HALF_UP —
    * the same rounding Spark's double→DECIMAL(18,9) cast applies to
    * the addends. */
  private def mean(sum: java.math.BigDecimal, n: Long): Double =
    sum.divide(java.math.BigDecimal.valueOf(n), 9,
      java.math.RoundingMode.HALF_UP).doubleValue

  /** The trained books: books(m)(k) is a subDim-dim centroid, plus the
    * final-round member count per (m, k). Geometry is parameterized so
    * the SAME trainer covers PQ (M subspaces of SubDim) and IVF coarse
    * centroids (one subspace of the full dimension — q154). */
  def train(s: SparkSession, dir: String, rounds: Int = Rounds,
            nSub: Int = M, subDim: Int = SubDim, nCent: Int = K)
    : (Array[Array[Array[Double]]], Array[Array[Long]]) = {
    import s.implicits._
    // corpus minus vector tombstones: erased vectors must not shape
    // the retrained book (graft.sources.VecTakedown's contract)
    val sub: Dataset[(Long, Int, Array[Double])] =
      graft.sources.VecTakedown.servedEmbeddings(s, dir)
      .select(col("vec_id"), VectorOps.toDoubleArr(col("embedding")).as("v"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        (0 until nSub).iterator.map(m =>
          (id, m, java.util.Arrays.copyOfRange(v, m * subDim, (m + 1) * subDim)))
      }.persist()
    trainSub(s, sub, rounds, nSub, subDim, nCent)
  }

  /** Nearest coarse cell by the SERVE-side reduced score ||c||² − 2·v·c
    * (ServeBooks.cell's arithmetic, strict ascending-index folds, first
    * index on ties) — the same cell every serve expression assigns, so
    * residual training and residual serving agree on which centroid a
    * vector's residual is taken against. */
  private[llm] def nearestCell(cents: Array[Array[Double]],
                               v: Array[Double]): Int = {
    var best = 0
    var bs = Double.MaxValue
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      var dt = 0.0; var cc = 0.0; var i = 0
      while (i < c.length) { dt += v(i) * c(i); cc += c(i) * c(i); i += 1 }
      val sc = cc - 2.0 * dt
      if (sc < bs) { bs = sc; best = k } // strict: ties keep min k
      k += 1
    }
    best
  }

  /** RESIDUAL product-quantization training — the IVFADC fine level
    * proper (Jégou et al. 2011 §III.C: quantize r = v − c(v), not v;
    * residual energy is a fraction of vector energy, so the same 4-bit
    * budget per subspace spends its 16 cells on a far smaller support —
    * q164's measured recall gain over the raw-vector books). Identical
    * Lloyd core and DECIMAL discipline as [[train]]; only the flatMap
    * prepends the row-local coarse assignment + subtraction, so the
    * scale shape is unchanged (one persisted scan, one ≤M·K-row agg per
    * round). */
  def trainResidual(s: SparkSession, dir: String,
                    coarse: Array[Array[Double]], rounds: Int = Rounds,
                    nSub: Int = M, subDim: Int = SubDim, nCent: Int = K)
    : (Array[Array[Array[Double]]], Array[Array[Long]]) = {
    import s.implicits._
    val sub: Dataset[(Long, Int, Array[Double])] =
      graft.sources.VecTakedown.servedEmbeddings(s, dir)
      .select(col("vec_id"), VectorOps.toDoubleArr(col("embedding")).as("v"))
      .as[(Long, Array[Double])]
      .flatMap { case (id, v) =>
        val cent = coarse(nearestCell(coarse, v))
        val r = Array.tabulate(v.length)(i => v(i) - cent(i))
        (0 until nSub).iterator.map(m =>
          (id, m, java.util.Arrays.copyOfRange(r, m * subDim, (m + 1) * subDim)))
      }.persist()
    trainSub(s, sub, rounds, nSub, subDim, nCent)
  }

  private def trainSub(s: SparkSession,
                       sub: Dataset[(Long, Int, Array[Double])], rounds: Int,
                       nSub: Int, subDim: Int, nCent: Int)
    : (Array[Array[Array[Double]]], Array[Array[Long]]) = {
    import s.implicits._

    // init = the K smallest vec_ids' subvectors, the script's "first K"
    val books: Array[Array[Array[Double]]] =
      Array.ofDim[Array[Double]](nSub, nCent)
    val idRank = sub.filter(_._2 == 0).map(_._1).orderBy(col("value"))
      .limit(nCent).collect().zipWithIndex.toMap
    sub.filter(r => idRank.contains(r._1)).collect()
      .foreach { case (id, m, x) => books(m)(idRank(id)) = x }

    // Round loop over a PLAIN-OBJECT RDD, not the typed Dataset: the
    // Dataset round paid UnsafeRow→tuple decoding plus the SQL agg
    // machinery on every one of the `rounds` passes. The RDD persists
    // (m, subvector) as JVM objects once, and each round is one
    // mapPartitions producing a bounded (nSub × nCent) partial —
    // counts + element sums in the EXACT DECIMAL(18,9) quantum as
    // scaled longs (StreamCentroid.toScaled's proven idiom: the same
    // HALF_UP quantization Spark's double→DECIMAL cast applies, summed
    // as integers, so the result is bit-identical to the old
    // sum(DECIMAL) aggregation under ANY partitioning or order). Only
    // the ≤ nSub·nCent·(1 + subDim) longs per partition reach the
    // driver. Sum headroom: |x_d| ≤ ~4 ⇒ ≤ 4·10⁹ per element; a
    // corpus past ~2·10⁹ members per cell re-scales the quantum.
    val subRdd = sub.rdd.map { case (_, m, x) => (m, x) }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    def toScaled(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(9, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
    val counts = Array.ofDim[Long](nSub, nCent)
    var r = 0
    while (r < rounds) {
      val bc = s.sparkContext.broadcast(books.map(_.map(_.clone())))
      val partials = subRdd.mapPartitions { it =>
        val cnt = Array.ofDim[Long](nSub, nCent)
        val sm = Array.ofDim[Long](nSub, nCent, subDim)
        it.foreach { case (m, x) =>
          val bk = bc.value(m)
          var best = 0
          var bd = Double.MaxValue
          var k = 0
          while (k < nCent) {
            var d2 = 0.0
            var d = 0
            while (d < subDim) {
              val t = x(d) - bk(k)(d); d2 += t * t; d += 1
            }
            if (d2 < bd) { bd = d2; best = k } // strict: ties keep min k
            k += 1
          }
          cnt(m)(best) += 1
          var d = 0
          while (d < subDim) {
            sm(m)(best)(d) += toScaled(x(d)); d += 1
          }
        }
        Iterator.single((cnt, sm))
      }.collect()
      for (m <- 0 until nSub; k <- 0 until nCent) counts(m)(k) = 0L
      val total = Array.ofDim[Long](nSub, nCent, subDim)
      partials.foreach { case (cnt, sm) =>
        for (m <- 0 until nSub; k <- 0 until nCent) {
          counts(m)(k) += cnt(m)(k)
          var d = 0
          while (d < subDim) { total(m)(k)(d) += sm(m)(k)(d); d += 1 }
        }
      }
      for (m <- 0 until nSub; k <- 0 until nCent; if counts(m)(k) > 0) {
        books(m)(k) = Array.tabulate(subDim)(d =>
          mean(new java.math.BigDecimal(
            java.math.BigInteger.valueOf(total(m)(k)(d)), 9), counts(m)(k)))
      }
      bc.destroy()
      r += 1
    }
    subRdd.unpersist()
    sub.unpersist()
    (books, counts)
  }

  /** q148 — the trained codebook in flat comparable form: one row per
    * (subspace, centroid, dim) with the final-round member count.
    * Rows-only by design (the merge loop is iterative, not
    * SQL-expressible — q131's precedent); exactness is proven by
    * PqTrainSpec's independent recomputation instead. */
  def pqTrainQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (books, counts) = train(s, dir)
    (for {
      m <- 0 until M; k <- 0 until K; d <- 0 until SubDim
    } yield (m.toLong, k.toLong, counts(m)(k), (d + 1).toLong, books(m)(k)(d)))
      .toDF("m", "k", "n_members", "dim", "cval")
      .orderBy(col("m"), col("k"), col("dim"))
  }
}
