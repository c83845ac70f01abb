package graft.queries

import graft.SparkSpec

/** Measures the approximate paths against brute-force ground truth —
  * the numbers that justify calling q32/q55 "scale paths": they trade
  * bounded recall loss for join cost that no longer grows quadratically.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  // measured at sf0.01 (500 vectors) — denser than the sf0.001 smoke set,
  // closer to the bucket occupancy the approximate paths are tuned for
  private val dir = "/root/testdata/sf0.01"

  private def topk(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

  private lazy val truth = topk(SimilarityQueries.knnBrute(spark, dir))

  test("IVF (8 probes over 32 trained cells) keeps recall@5 above 80%") {
    // trained (frozen k-means) codebook: measured 0.83 examining ~27%
    // of the corpus — the first-16-vectors scaffold sat at 0.66.
    val got = topk(SimilarityQueries.knnIvf(spark, dir))
    val recall = (truth & got).size.toDouble / truth.size
    info(f"IVF recall@5 = $recall%.3f")
    assert(recall >= 0.8, f"recall=$recall%.3f")
  }

  test("multi-table random-hyperplane LSH keeps recall@5 above 60%") {
    // 6 tables × 10 random-projection bits, Hamming≤2 multi-probe:
    // measured 0.69 examining ~29% of the corpus (the old single-table
    // axis-aligned 8-bit code managed 0.14).
    val got = topk(SimilarityQueries.knnLsh(spark, dir))
    val recall = (truth & got).size.toDouble / truth.size
    info(f"LSH recall@5 = $recall%.3f")
    assert(recall >= 0.6, f"recall=$recall%.3f")
  }

  test("vec-pair and LSH-bucket stores equal their from-scratch arms " +
    "and rebuild nothing on reuse") {
    val bSet = SimilarityQueries.lshBuckets(spark, dir)
      .as[(Long, Int, Long)].collect().toSet
    assert(bSet == SimilarityQueries.lshBucketsDirect(spark, dir)
      .as[(Long, Int, Long)].collect().toSet,
      "served plane buckets must equal the inline hash")
    val pSet = SimilarityQueries.embedNearDup(spark, dir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pSet == SimilarityQueries.embedNearDupBruteDirect(spark, dir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet,
      "served near-dup pairs must equal the inline all-pairs scan")
    for (key <- Seq("lsh_buckets_p6_v1", "vec_pair_cos_v1")) {
      val builds = graft.ArtifactStore.buildCount.getOrDefault(key, 0)
      val again = if (key.startsWith("lsh"))
        SimilarityQueries.lshBuckets(spark, dir)
      else SimilarityQueries.embedNearDup(spark, dir)
      again.collect()
      assert(graft.ArtifactStore.buildCount.getOrDefault(key, 0) == builds,
        s"a same-corpus reuse of $key must serve, not rebuild")
    }
  }

  test("r17 arm top-K stores equal their inline cores, serve without " +
    "rebuilding, and are wired into the vector-takedown cascade") {
    def rset(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select("query_id", "neighbor_id", "rn")
        .as[(Long, Long, Long)].collect().toSet
    val arms: Seq[(String, org.apache.spark.sql.DataFrame,
                   org.apache.spark.sql.DataFrame)] = Seq(
      ("ann_topk_ivf_v1", SimilarityQueries.annTopkIvf(spark, dir),
        SimilarityQueries.knnIvfCore(spark, dir)),
      ("ann_topk_pq_v1", SimilarityQueries.annTopkPq(spark, dir),
        SimilarityQueries.knnIvfPqCore(spark, dir)),
      ("ann_topk_res_v1", SimilarityQueries.annTopkRes(spark, dir),
        SimilarityQueries.knnIvfPqResCore(spark, dir)),
      ("ann_topk_int8_v1", SimilarityQueries.annTopkInt8(spark, dir),
        SimilarityQueries.knnIvfInt8Core(spark, dir)))
    for ((key, served, inline) <- arms) {
      assert(rset(served) == rset(inline),
        s"$key must equal its from-scratch serve pipeline, rank for rank")
      val builds = graft.ArtifactStore.buildCount.getOrDefault(key, 0)
      SimilarityQueries.annTopk(spark, dir, key)(
        sys.error("reuse must not invoke the build thunk")).collect()
      assert(graft.ArtifactStore.buildCount.getOrDefault(key, 0) == builds,
        s"a same-corpus reuse of $key must serve, not rebuild")
    }
    // takedown wiring: the stored lists derive from the tombstone-
    // filtered corpus through the books, so they must die in the same
    // cascade (a flag/reset that spared them would serve stale ranks)
    assert(SimilarityQueries.AnnTopkKeys.toSet.subsetOf(
      graft.sources.VecTakedown.embArtifactKeys.toSet),
      "every arm top-K store must be in VecTakedown.embArtifactKeys")
  }

  // exact-L2 top-5: ground truth for the ADC paths (q64/q113), whose
  // re-rank metric is L2 — computed here, not registered (brute
  // baselines in the registry are capped at q31)
  private lazy val l2Truth: Set[(Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), graft.llm.VectorOps.toDoubleArr(col("embedding")).as("v"))
    val l2 = graft.llm.VectorOps.dot(col("a.v"), col("a.v")) -
      lit(2.0) * graft.llm.VectorOps.dot(col("a.v"), col("b.v")) +
      graft.llm.VectorOps.dot(col("b.v"), col("b.v"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("d"), col("neighbor_id"))
    e.as("a").where(col("a.vec_id") < 50)
      .join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
        l2.as("d"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
  }

  test("IVF-PQ keeps recall@5 above 60% against exact-L2 truth") {
    // Losses come from both the 8-of-32 probe and the 16-way-per-
    // subspace quantization.
    val got = topk(SimilarityQueries.knnIvfPq(spark, dir))
    val recall = (l2Truth & got).size.toDouble / l2Truth.size
    info(f"IVF-PQ recall@5 = $recall%.3f")
    assert(recall >= 0.6, f"recall=$recall%.3f")
  }

  test("residual IVF-PQ beats the raw-PQ arm: recall@5 above 75% " +
      "against exact-L2 truth") {
    // IVFADC proper (residual encoding): same 8-byte code budget, same
    // probe set, same shortlist-50 — measured 0.800 at sf0.01 vs the
    // raw-vector books' 0.756; the residual's smaller support spends
    // the 16 cells/subspace where the error actually lives.
    val got = topk(SimilarityQueries.knnIvfPqRes(spark, dir))
    val recall = (l2Truth & got).size.toDouble / l2Truth.size
    val raw = topk(SimilarityQueries.knnIvfPq(spark, dir))
    val rawRecall = (l2Truth & raw).size.toDouble / l2Truth.size
    info(f"residual IVF-PQ recall@5 = $recall%.3f (raw PQ = $rawRecall%.3f)")
    assert(recall >= 0.75, f"recall=$recall%.3f")
    assert(recall >= rawRecall,
      f"residual ($recall%.3f) must not trail raw PQ ($rawRecall%.3f)")
  }

  test("IVF-int8 beats the PQ bar: recall@5 above 80% against exact-L2 truth") {
    // Same coarse probe as q55/q64, int8-ADC shortlist-50, exact
    // re-rank. int8 reconstruction error is tiny next to PQ's, so the
    // shortlist essentially never evicts a true neighbor — recall
    // should track the probe-limited ceiling, well above PQ's 0.6 bar.
    val got = topk(SimilarityQueries.knnIvfInt8(spark, dir))
    val recall = (l2Truth & got).size.toDouble / l2Truth.size
    info(f"IVF-int8 recall@5 = $recall%.3f")
    assert(recall >= 0.8, f"recall=$recall%.3f")
  }

  test("q106 codes and scaled reconstruction error match a brute recomputation") {
    val res = SimilarityQueries.int8Quantize(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val dim = vecs.head._2.length
    val mn = Array.tabulate(dim)(i => vecs.map(_._2(i)).min)
    val mx = Array.tabulate(dim)(i => vecs.map(_._2(i)).max)
    val brute = vecs.map { case (id, v) =>
      var cs = 0L; var e9 = 0L
      for (i <- 0 until dim) {
        val c = if (mx(i) == mn(i)) 0L
          else math.min(255L, math.max(0L,
            math.floor(((v(i) - mn(i)) * 255.0) / (mx(i) - mn(i))).toLong))
        val err = v(i) - (mn(i) + ((c + 0.5) * (mx(i) - mn(i))) / 255.0)
        cs += c; e9 += math.floor(err * err * 1000000000.0).toLong
      }
      (id, cs, e9)
    }.sortBy(t => (-t._3, t._1)).take(20)
    assert(res.toSeq == brute.toSeq)
    // every code must land in int8 range; error bounded by half a bucket
    // per dim: e9 <= dim * (range/510)^2 * 1e9 for each emitted vector
    for ((id, _, e9) <- brute) {
      val bound = (0 until dim).map(i =>
        math.pow((mx(i) - mn(i)) / 510.0, 2) * 1000000000.0).sum
      assert(e9 <= bound + dim, s"vec $id ssq above the half-bucket bound")
    }
  }

  test("q116 covariance numerators match a brute recomputation; no join in the plan") {
    val df = SimilarityQueries.embedCovariance(spark, sfDir)
    val res = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(_.getSeq[Float](1).map(f =>
        math.floor(f.toDouble * 1000.0).toLong).toArray)
    val dim = vecs.head.length
    assert(res.size == dim * (dim + 1) / 2, "upper triangle must be complete")
    val n = vecs.length.toLong
    for (i <- 0 until dim; j <- i until dim) {
      val si = vecs.map(_(i)).sum
      val sj = vecs.map(_(j)).sum
      val qij = vecs.map(v => v(i) * v(j)).sum
      assert(res((i.toLong, j.toLong)) == ((n, n * qij - si * sj)),
        s"($i,$j) numerator mismatch")
    }
    // variance diagonal must be non-negative (Cauchy-Schwarz sanity)
    for (i <- 0 until dim)
      assert(res((i.toLong, i.toLong))._2 >= 0L, s"negative variance at $i")
    // scale guard: pairs form row-locally — no join of any kind
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"), "q116 must not self-join the exploded table")
  }

  test("q155 cohesion audit equals a brute sampled-pair recomputation") {
    def h60(tag: String, v: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest((tag + "|" + v).getBytes("UTF-8"))
      var x = 0L
      for (i <- 0 until 7) x = (x << 8) | (d(i) & 0xffL)
      (x << 4) | ((d(7) & 0xf0L) >>> 4)
    }
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val reps = rows.groupBy(_._2).view.mapValues(
      _.sortBy(t => (h60("lrep", t._1.toString), t._1)).take(8)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (p, q) => p * q }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val flat = reps.toSeq.flatMap { case (l, vs) => vs.map(v => (l, v._1, v._3)) }
    val exp = flat.flatMap { case (la, ia, va) =>
      flat.collect { case (lb, ib, vb)
        if la < lb || (la == lb && ia < ib) =>
        ((la, lb), java.math.BigDecimal.valueOf(cos(va, vb))
          .setScale(9, java.math.RoundingMode.HALF_UP))
      }
    }.groupBy(_._1).view.mapValues { ps =>
      (ps.size.toLong,
        ps.map(_._2).reduce(_.add(_)).doubleValue)
    }.toMap
    val got = SimilarityQueries.labelCohesion(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, (n, cs)) =>
      assert(n == exp(k)._1, s"$k pair count")
      assert(java.lang.Double.compare(cs, exp(k)._2) == 0,
        s"$k cos_sum: got $cs, brute ${exp(k)._2}")
    }
    // structure: diagonal pairs are C(k,2), off-diagonal k*k
    val k = 8L
    got.foreach { case ((la, lb), (n, _)) =>
      if (la == lb) assert(n == k * (k - 1) / 2, s"($la,$lb) intra count")
      else assert(n == k * k, s"($la,$lb) inter count")
    }
  }

  test("q150 fixed-point eigenvector equals a brute BigInt power iteration") {
    val S = BigInt(1000000)
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(_.getSeq[Float](1).map(f =>
        BigInt(math.floor(f.toDouble * 1000.0).toLong)).toArray)
    val dim = vecs.head.length
    val n = BigInt(vecs.length)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val si = vecs.map(_(i)).sum; val sj = vecs.map(_(j)).sum
      val qij = vecs.map(v => v(i) * v(j)).sum
      n * qij - si * sj
    }
    var v = Array.fill(dim)(S)
    for (_ <- 1 to 8) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => cov(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max
      v = w.map(x => x.sign * (x.abs * S / m))
    }
    val got = SimilarityQueries.pcaPower(spark, sfDir).collect()
      .map(r => r.getLong(0) -> BigInt(r.getLong(1))).toMap
    assert(got.size == dim)
    for (i <- 0 until dim)
      assert(got(i.toLong) == v(i), s"component $i differs from brute")
    // max-normalization invariant: some component sits at exactly ±S
    assert(got.values.map(_.abs).max == S, "max-norm rescale must pin to S")
  }

  test("q129 per-query hits equal an independent set intersection; bounds hold") {
    // at sf0.01 like the bar tests above — the audit must REPRODUCE the
    // recall they measure, so it runs where they run
    val res = SimilarityQueries.annRecall(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val brute = SimilarityQueries.knnBrute(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = SimilarityQueries.knnIvf(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(res.keySet == brute.keySet, "one audit row per query")
    res.foreach { case (q, (hits, k)) =>
      assert(k == 5L)
      val expect = brute(q).intersect(ivf.getOrElse(q, Set.empty)).size.toLong
      assert(hits == expect, s"query $q: $hits vs brute-set $expect")
      assert(hits >= 0L && hits <= k)
    }
    // the audit must reproduce the recall the IVF bar test measures
    val recall = res.values.map(_._1).sum.toDouble / (res.size * 5.0)
    assert(recall >= 0.8, s"audit recall $recall below the q55 spec bar")
  }

  test("LSH near-dup pairs are a subset of brute-force pairs") {
    val brute = SimilarityQueries.embedNearDup(spark, sfDir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lsh = SimilarityQueries.embedNearDupLsh(spark, sfDir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
  }

  test("MinHash-LSH near-dup (q27) achieves full recall vs brute q25 here") {
    val brute = DedupQueries.ngramJaccard(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = DedupQueries.minhashNearDup(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh == brute) // J≥0.5 pairs almost surely collide in ≥1 of 4 bands
  }

  test("q134 truncation audit: well-formed, above chance, and honestly lossy") {
    val rows = SimilarityQueries.prefixRecall(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 50)
    rows.foreach { case (_, hits, k, dims) =>
      assert(k == 5L && dims == 16L && hits >= 0L && hits <= k)
    }
    val mean = rows.map(_._2).sum.toDouble / (5.0 * rows.length)
    // chance overlap of two top-5 lists over ~500 vectors is ~0.01;
    // the 16-dim prefix must beat chance decisively...
    assert(mean > 0.05, s"prefix recall $mean is indistinguishable from chance")
    // ...and on THESE unstructured synthetic embeddings it cannot be
    // lossless — a 1.0 here would mean the audit isn't measuring
    assert(mean < 1.0, s"prefix recall $mean claims lossless truncation")
  }
}
