package graft.llm

import graft.SparkSpec

/** Distributed IVF coarse-centroid training (q154) correctness: the
  * engine's trained lists equal an INDEPENDENT pure-Scala Lloyd
  * recomputation over the full-dimension vectors — same contract as
  * PqTrainSpec (first-K init, exact DECIMAL(18,9) element sums,
  * scale-9 HALF_UP means, min-id ties, frozen empty cells) at the
  * degenerate one-subspace geometry. Exact equality is the point: the
  * decimal-sum discipline makes float k-means deterministic.
  */
class IvfTrainSpec extends SparkSpec {

  import IvfTrain.K
  private val Dim = VectorOps.Dim

  private def quant(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(9, java.math.RoundingMode.HALF_UP)

  private def brute(rounds: Int)
    : (Array[Array[Double]], Array[Long]) = {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    val books = Array.tabulate(K)(k => rows(k)._2.clone())
    val counts = Array.ofDim[Long](K)
    for (_ <- 1 to rounds) {
      val sums = Array.fill(K)(Array.fill(Dim)(java.math.BigDecimal.ZERO))
      java.util.Arrays.fill(counts, 0L)
      rows.foreach { case (_, v) =>
        var best = 0; var bd = Double.MaxValue
        for (k <- 0 until K) {
          var d2 = 0.0
          for (d <- 0 until Dim) { val t = v(d) - books(k)(d); d2 += t * t }
          if (d2 < bd) { bd = d2; best = k }
        }
        counts(best) += 1
        for (d <- 0 until Dim)
          sums(best)(d) = sums(best)(d).add(quant(v(d)))
      }
      for (k <- 0 until K; if counts(k) > 0L)
        books(k) = Array.tabulate(Dim)(d =>
          sums(k)(d).divide(java.math.BigDecimal.valueOf(counts(k)),
            9, java.math.RoundingMode.HALF_UP).doubleValue)
    }
    (books, counts)
  }

  test("q154 trained lists equal the independent recomputation bit-for-bit") {
    val (books, counts) = brute(IvfTrain.Rounds)
    val got = IvfTrain.ivfTrainQuery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> ((r.getLong(1), r.getDouble(3))))
      .toMap
    assert(got.size == K * Dim)
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(counts.sum == n, "every vector must land in exactly one list")
    for (k <- 0 until K; d <- 0 until Dim) {
      val (nm, cv) = got((k.toLong, (d + 1).toLong))
      assert(nm == counts(k), s"list $k member count")
      assert(java.lang.Double.compare(cv, books(k)(d)) == 0,
        s"list $k dim $d: engine $cv vs brute ${books(k)(d)}")
    }
    // training must separate the space: >1 non-empty list at test scale
    assert(counts.count(_ > 0L) > 1, "degenerate single-cluster training")
  }
}
