package graft.queries

import graft.SparkSpec

/** q189 MMR rerank re-derived from first principles: a textbook greedy
  * loop in plain Scala (left-to-right double dot products — the
  * VectorOps determinism contract) must reproduce the query's
  * join+window plan selection for every query and step, and the rerank
  * must actually diversify (differ from pure top-K) somewhere on this
  * corpus — otherwise the operator is a no-op dressed up.
  */
class MmrSpec extends SparkSpec {

  private val ShortK = 20
  private val K = 5

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  test("q189 equals the textbook greedy MMR; the rerank diversifies") {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) as v")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val nrm = vecs.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    def cos(a: Long, b: Long): Double =
      dot(vecs(a), vecs(b)) / (nrm(a) * nrm(b))

    val queries = vecs.keys.filter(_ < 50L).toSeq.sorted
    val expected = queries.flatMap { q =>
      val short = vecs.keys.filter(_ != q).toSeq
        .map(c => c -> cos(q, c))
        .sortBy { case (id, rel) => (-rel, id) }.take(ShortK)
      var sel = Vector.empty[(Long, Double, Double)] // (id, rel, mmr)
      (1 to K).foreach { _ =>
        val picked = short.filterNot(c => sel.exists(_._1 == c._1))
          .map { case (id, rel) =>
            val ms = if (sel.isEmpty) 0.0
              else sel.map(s => cos(id, s._1)).max
            (id, rel, 0.7 * rel - 0.3 * ms)
          }
          .minBy { case (id, _, mmr) => (-mmr, id) }
        sel :+= picked
      }
      sel.zipWithIndex.map { case ((id, rel, mmr), i) =>
        (q, (i + 1).toLong, id, rel, mmr)
      }
    }

    val rows = SimilarityQueries.mmrRerank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(rows.size == queries.size * K)
    assert(rows.sorted == expected.sorted,
      "query plan selection differs from the textbook greedy")

    // diversification: for at least one query the MMR set is not the
    // pure relevance top-K
    val byQ = rows.groupBy(_._1)
    val diversified = queries.exists { q =>
      val topK = vecs.keys.filter(_ != q).toSeq
        .map(c => c -> cos(q, c))
        .sortBy { case (id, rel) => (-rel, id) }.take(K).map(_._1).toSet
      byQ(q).map(_._3).toSet != topK
    }
    assert(diversified, "MMR never deviated from pure top-K on this corpus")
  }

  test("q190 IVF arm: K rows per query, greedy-monotone mmr, rel bounded by step 1") {
    val rows = SimilarityQueries.mmrRerankIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val byQ = rows.groupBy(_._1)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to K), s"query $q steps")
      val inStep = rs.sortBy(_._2)
      // greedy MMR scores are non-increasing FROM STEP 2: the argmax at
      // step i+1 was available at step i under a no-larger penalty
      // (the selected set only grows). Step 1→2 is exempt: the
      // empty-set penalty is 0 by convention, while a singleton set's
      // real max-sim can be NEGATIVE — raising step 2 above step 1.
      inStep.drop(1).map(_._5).toSeq.sliding(2).foreach { case Seq(a, b) =>
        assert(a >= b, s"query $q: mmr must be non-increasing ($a < $b)")
      case _ => ()
      }
      // step 1 is the pure-relevance pick of its own feed
      assert(inStep.head._4 == rs.map(_._4).max, s"query $q step-1 rel")
    }
  }
}
