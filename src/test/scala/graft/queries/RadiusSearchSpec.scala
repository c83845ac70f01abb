package graft.queries

import graft.SparkSpec

/** q193/q194 radius (range) search re-derived from first principles:
  * the exact arm must equal a Scala brute recomputation bit-for-bit
  * (cosine is a strict left-fold dot — the VectorOps contract), and
  * the IVF arm must be a subset of the exact ball with identical
  * cosine bits (feed recall is the ONLY difference between the arms).
  */
class RadiusSearchSpec extends SparkSpec {

  private val Tau = 0.3

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  test("q193 equals the brute ball; q194 is the ball through the probe " +
    "feed, cosine bits identical") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val nrm = vecs.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    val expected = (for {
      q <- vecs.keys.toSeq.filter(_ < 50)
      n <- vecs.keys.toSeq if n != q
      cos = dot(vecs(q), vecs(n)) / (nrm(q) * nrm(n))
      if cos >= Tau
    } yield (q, n) -> java.lang.Double.doubleToLongBits(cos)).toMap

    val exact = SimilarityQueries.radiusSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        java.lang.Double.doubleToLongBits(r.getDouble(2))).toMap
    assert(exact == expected,
      "q193 must equal the textbook ball bit-for-bit")
    assert(exact.nonEmpty, "witness: the ball must be populated")

    val ivf = SimilarityQueries.radiusSearchIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        java.lang.Double.doubleToLongBits(r.getDouble(2))).toMap
    assert(ivf.nonEmpty, "witness: the probed ball must be populated")
    ivf.foreach { case (k, bits) =>
      assert(exact.contains(k), s"IVF pair $k not in the exact ball")
      assert(exact(k) == bits, s"IVF cosine bits differ for $k")
    }
    // the 8-of-32 probe feed should catch most of the ball here — a
    // loose floor, meant to catch a broken probe join, not tune recall
    assert(ivf.size * 2 >= exact.size,
      s"suspicious recall: ${ivf.size}/${exact.size}")

    // q198: the audit re-aggregated by hand from the two arms
    val expAudit = exact.keys.groupBy(_._1).map { case (q, ks) =>
      val ball = ks.size.toLong
      val hits = ks.count(ivf.contains).toLong
      q -> (ball, hits, hits * 1000 / ball)
    }
    val audit = SimilarityQueries.radiusRecall(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(audit == expAudit,
      "q198 must equal the hand-aggregated recall per query")
  }
}
