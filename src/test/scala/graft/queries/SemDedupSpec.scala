package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.llm.IvfCodebook

/** Independent (non-oracle) evidence for q101 SemDeDup pruning and q102
  * centroid update: a from-scratch Scala recomputation of both outputs
  * at sf0.001, Lloyd's SSE-descent invariant, and plan-shape guards
  * (cluster-bounded join only; single partial-aggregated shuffle).
  */
class SemDedupSpec extends SparkSpec {

  // strict left-fold dot — bit-identical to graft_dot / list_dot_product
  private def dotL(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) { s += a(i) * b(i); i += 1 }
    s
  }

  // local recomputation of the shared assignment with THE SAME double
  // arithmetic as the query (expanded form nrm² − 2·v·c + cnrm², nrm via
  // sqrt — not exact Σ(v−c)², whose last-ulp noise could flip the
  // cross-vector dist comparisons the domination rule makes)
  private lazy val local: Seq[(Long, Array[Double], Int, Double)] = {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toSeq
    val cn = IvfCodebook.centroids.map(c => math.sqrt(dotL(c, c)))
    vecs.map { case (id, v) =>
      val nrm = math.sqrt(dotL(v, v))
      val byCell = IvfCodebook.centroids.zipWithIndex.map { case (c, i) =>
        (nrm * nrm - 2.0 * dotL(v, c) + cn(i) * cn(i), i)
      }
      val (d, cell) = byCell.minBy(identity)
      (id, v, cell, d)
    }
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i => dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q101 kept set == brute-force SemDeDup recomputation at sf0.001") {
    val got = graft.SparkEntry.queries("q101_semdedup_prune")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val expected = local.map { case (id, v, cell, d) =>
      val dominated = local.exists { case (oid, ov, ocell, od) =>
        ocell == cell && (od < d || (od == d && oid < id)) &&
          cos(ov, v) >= 0.4
      }
      (id, cell.toLong, !dominated)
    }.sortBy(_._1)
    assert(got == expected)
    // and the rule did something at this scale: both verdicts occur
    assert(got.exists(_._3) && got.exists(!_._3),
      "sf0.001 should contain at least one dropped and one kept vector")
  }

  test("q101 scale fallback: sub-bucketed drops are a sound subset") {
    // Above SemDedupGateRows the pair join adds a sign-sub-bucket
    // equality key, bounding per-key fan-out when a frozen codebook
    // meets a grown corpus. Its pairs are a subset of the exact plan's,
    // so its error must be one-sided: everything it drops, the exact
    // semantics drops too (it may only keep extra).
    val exact = SimilarityQueries
      .semDedupPruneImpl(spark, sfDir, subBucketed = false)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val sub = SimilarityQueries
      .semDedupPruneImpl(spark, sfDir, subBucketed = true)
      .collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(sub.length == exact.size)
    sub.foreach { case (id, kept) =>
      if (!kept) assert(!exact(id),
        s"scale path dropped vec $id that exact semantics keeps")
    }
    // and the registered q101 rides the exact branch at oracle scales
    assert(Tables.embeddings(spark, sfDir).count() <=
      SimilarityQueries.SemDedupGateRows)
  }

  test("q102 centroid update == local recomputation and descends SSE") {
    // long form: one row per (cell, dim) — regroup to per-cell vectors
    val rows = graft.SparkEntry.queries("q102_centroid_update")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.foreach { case (_, _, dim, _) => assert(dim >= 1 && dim <= 64) }
    val got = rows.groupBy(r => (r._1, r._2)).toSeq
      .map { case ((cell, n), ds) =>
        assert(ds.map(_._3).sorted.toSeq == (1L to 64L))
        (cell, n, ds.sortBy(_._3).map(_._4))
      }
      .sortBy(_._1)
    val byCell = local.groupBy(_._3)
    // membership counts match
    assert(got.map(g => g._1 -> g._2).toMap ==
      byCell.map { case (c, ms) => c.toLong -> ms.size.toLong })
    // means match to the DECIMAL(18,9) quantum
    got.foreach { case (cell, n, mean) =>
      val ms = byCell(cell.toInt)
      mean.indices.foreach { i =>
        val exact = ms.map(_._2(i)).sum / n
        assert(math.abs(mean(i) - exact) < 1e-8,
          s"cell $cell dim $i: $exact vs ${mean(i)}")
      }
    }
    // Lloyd invariant: SSE against the UPDATED means <= SSE against the
    // frozen centroids (the mean minimizes within-cell squared error)
    val newMeans = got.map(g => g._1.toInt -> g._3).toMap
    def sse(cent: Int => Array[Double]): Double =
      local.map { case (_, v, cell, _) =>
        val c = cent(cell)
        v.indices.map(j => (v(j) - c(j)) * (v(j) - c(j))).sum
      }.sum
    assert(sse(newMeans) <= sse(IvfCodebook.centroids) + 1e-9)
  }

  test("q101 pairs meet only through the cell equi-join (no all-pairs)") {
    val df = graft.SparkEntry.queries("q101_semdedup_prune")(spark, sfDir)
    val p = df.queryExecution.sparkPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(1200))
    // the only nested-loops are the 32-row centroid broadcast fan-outs
    // (one per instantiation of the assignment subplan: a, b, verdict)
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl <= 3, s"expected only centroid-broadcast fan-outs, got $bnl:\n${p.take(1500)}")
    // the vector-vector pair stage itself is an equi-join on cell
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q102 shuffles partial aggregates, not vector rows") {
    val df = graft.SparkEntry.queries("q102_centroid_update")(spark, sfDir)
    val aggs = df.queryExecution.sparkPlan.collect {
      case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
    }
    // partial + final pair around the single exchange → map-side combine
    assert(aggs.size >= 2, df.queryExecution.sparkPlan.toString.take(1500))
  }
}
