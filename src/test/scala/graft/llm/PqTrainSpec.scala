package graft.llm

import graft.SparkSpec

/** Distributed PQ codebook training (q148) correctness: the engine's
  * trained books equal an INDEPENDENT pure-Scala Lloyd recomputation
  * written directly against the parquet — same contract (init = first
  * K subvectors, exact DECIMAL(18,9) element sums, scale-9 HALF_UP
  * means, ties to the smallest centroid, empty cells frozen), no
  * engine code shared beyond the data. Exact equality is the point:
  * the decimal-sum discipline makes float k-means deterministic, so
  * any partitioning/scheduling dependence in the engine shows up as a
  * bit mismatch here.
  */
class PqTrainSpec extends SparkSpec {

  import PqTrain.{M, SubDim, K}

  private def quant(x: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(x).setScale(9, java.math.RoundingMode.HALF_UP)

  private def rawRows(dir: String): Array[(Long, Array[Double])] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)

  /** Pure driver-side PQ trainer over the raw parquet. */
  private def brute(dir: String, rounds: Int)
    : (Array[Array[Array[Double]]], Array[Array[Long]]) =
    bruteRows(rawRows(dir), rounds)

  private def bruteRows(rows: Array[(Long, Array[Double])], rounds: Int)
    : (Array[Array[Array[Double]]], Array[Array[Long]]) = {
    val books = Array.ofDim[Array[Double]](M, K)
    for (k <- 0 until K; m <- 0 until M)
      books(m)(k) = rows(k)._2.slice(m * SubDim, (m + 1) * SubDim)
    val counts = Array.ofDim[Long](M, K)
    for (_ <- 1 to rounds) {
      val sums = Array.fill(M, K)(
        Array.fill(SubDim)(java.math.BigDecimal.ZERO))
      for (m <- 0 until M; k <- 0 until K) counts(m)(k) = 0L
      rows.foreach { case (_, v) =>
        for (m <- 0 until M) {
          val x = v.slice(m * SubDim, (m + 1) * SubDim)
          var best = 0; var bd = Double.MaxValue
          for (k <- 0 until K) {
            var d2 = 0.0
            for (d <- 0 until SubDim) { val t = x(d) - books(m)(k)(d); d2 += t * t }
            if (d2 < bd) { bd = d2; best = k }
          }
          counts(m)(best) += 1
          for (d <- 0 until SubDim)
            sums(m)(best)(d) = sums(m)(best)(d).add(quant(x(d)))
        }
      }
      for (m <- 0 until M; k <- 0 until K; if counts(m)(k) > 0L)
        books(m)(k) = Array.tabulate(SubDim)(d =>
          sums(m)(k)(d).divide(java.math.BigDecimal.valueOf(counts(m)(k)),
            9, java.math.RoundingMode.HALF_UP).doubleValue)
    }
    (books, counts)
  }

  test("q148 trained books equal the independent recomputation bit-for-bit") {
    val (bBooks, bCounts) = brute(sfDir, PqTrain.Rounds)
    val got = graft.SparkEntry.queries("q148_pq_train")(spark, sfDir).collect()
    assert(got.length == M * K * SubDim)
    got.foreach { r =>
      val (m, k, n, d, v) = (r.getLong(0).toInt, r.getLong(1).toInt,
        r.getLong(2), r.getLong(3).toInt - 1, r.getDouble(4))
      assert(n == bCounts(m)(k), s"members m=$m k=$k")
      assert(v == bBooks(m)(k)(d),
        s"centroid m=$m k=$k d=$d: $v vs ${bBooks(m)(k)(d)}")
    }
    // structural sanity: every subspace's final assignment covers all
    // vectors, and training actually moved + separated the centroids
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    for (m <- 0 until M) {
      assert(bCounts(m).sum == nVecs, s"subspace $m must partition the vectors")
      assert(bBooks(m).map(_.toVector).distinct.length == K,
        s"subspace $m centroids must stay distinct")
    }
  }

  test("residual trainer equals an independent residual recomputation " +
      "bit-for-bit and beats raw-PQ quantization error") {
    // Given the served coarse book (its own training proven by
    // IvfTrainSpec/ArtifactStoreSpec), rebuild the residual mapping
    // independently — reduced-score argmin ||c||²−2·v·c, first index on
    // ties, single IEEE subtract per element — then run the same
    // driver-side Lloyd over the residual rows.
    val coarse = graft.llm.ServeBooks.coarse(spark, sfDir)
    def residual(v: Array[Double]): Array[Double] = {
      var best = 0; var bs = Double.MaxValue
      for (k <- coarse.indices) {
        var dt = 0.0; var cc = 0.0
        for (i <- coarse(k).indices) {
          dt += v(i) * coarse(k)(i); cc += coarse(k)(i) * coarse(k)(i)
        }
        val sc = cc - 2.0 * dt
        if (sc < bs) { bs = sc; best = k }
      }
      Array.tabulate(v.length)(i => v(i) - coarse(best)(i))
    }
    val rows = rawRows(sfDir).map { case (id, v) => (id, residual(v)) }
    val (bBooks, bCounts) = bruteRows(rows, PqTrain.Rounds)
    val (gBooks, gCounts) =
      PqTrain.trainResidual(spark, sfDir, coarse, PqTrain.Rounds)
    for (m <- 0 until M; k <- 0 until K) {
      assert(gCounts(m)(k) == bCounts(m)(k), s"members m=$m k=$k")
      for (d <- 0 until SubDim)
        assert(gBooks(m)(k)(d) == bBooks(m)(k)(d),
          s"centroid m=$m k=$k d=$d")
    }
    // the point of residual encoding: at the same code budget the
    // quantization SSE drops versus the raw-vector books (q164's
    // recall gain is downstream of exactly this number)
    def sse(rs: Array[(Long, Array[Double])],
            books: Array[Array[Array[Double]]]): Double =
      rs.map { case (_, v) =>
        (0 until M).map { m =>
          val x = v.slice(m * SubDim, (m + 1) * SubDim)
          (0 until K).map { k =>
            (0 until SubDim).map { d =>
              val t = x(d) - books(m)(k)(d); t * t }.sum
          }.min
        }.sum
      }.sum
    val (rawBooks, _) = brute(sfDir, PqTrain.Rounds)
    val rawSse = sse(rawRows(sfDir), rawBooks)
    val resSse = sse(rows, bBooks)
    info(f"raw-PQ SSE = $rawSse%.3f, residual-PQ SSE = $resSse%.3f")
    assert(resSse < rawSse,
      "residual books must quantize tighter than raw books")
  }

  test("q148 training monotonically improves quantization error") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def sse(books: Array[Array[Array[Double]]]): Double =
      rows.map { case (_, v) =>
        (0 until M).map { m =>
          val x = v.slice(m * SubDim, (m + 1) * SubDim)
          (0 until K).map { k =>
            (0 until SubDim).map { d =>
              val t = x(d) - books(m)(k)(d); t * t }.sum
          }.min
        }.sum
      }.sum
    val (init, _) = brute(sfDir, 0)
    val (trained, _) = brute(sfDir, PqTrain.Rounds)
    assert(sse(trained) < sse(init),
      "Lloyd rounds must reduce the total quantization error")
  }
}
