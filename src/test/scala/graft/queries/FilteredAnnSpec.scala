package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Cross-query invariants for q181 (label-filtered IVF ANN) and q182
  * (band-configuration recall curve) — the properties that tie the new
  * audits to the queries they generalize, beyond the per-query oracle.
  */
class FilteredAnnSpec extends SparkSpec {
  import spark.implicits._

  test("q181: every neighbor shares its query's label; lists are <= K " +
    "deep; label-matching q55 hits survive filtering with rank no worse") {
    val filtered = graft.SparkEntry.queries("q181_knn_filtered")(spark, sfDir)
      .collect()
    assert(filtered.nonEmpty, "witness: filtered search must return rows")
    val labelOf = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("label").cast("long"))
      .as[(Long, Long)].collect().toMap
    filtered.foreach { r =>
      val q = r.getAs[Long]("query_id"); val n = r.getAs[Long]("neighbor_id")
      assert(labelOf(n) == labelOf(q),
        s"neighbor $n of query $q crosses the label filter")
      assert(r.getAs[Long]("label") == labelOf(q))
      assert(r.getAs[Long]("rn") <= 5L)
    }
    // containment vs q55: a label-matching unfiltered hit competes in
    // q181 against a SUBSET of its q55 rivals (same candidate pool,
    // same probes), so it must survive with the same cosine bits and a
    // rank no worse — and filtering can never IMPROVE the best cosine
    val unfiltered = graft.SparkEntry.queries("q55_knn_ivf")(spark, sfDir)
      .collect()
    val fMap = filtered.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        ((r.getAs[Long]("rn"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("cos"))))).toMap
    val matching = unfiltered.filter(r =>
      labelOf(r.getAs[Long]("neighbor_id")) ==
        labelOf(r.getAs[Long]("query_id")))
    assert(matching.nonEmpty,
      "witness: some unfiltered hits must match their query's label")
    matching.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      val (rn, cosBits) = fMap.getOrElse(k,
        fail(s"label-matching q55 hit $k missing from q181"))
      assert(rn <= r.getAs[Long]("rn"),
        s"$k ranked worse under filtering")
      assert(cosBits ==
        java.lang.Double.doubleToLongBits(r.getAs[Double]("cos")),
        s"$k cosine changed under filtering")
    }
    val bestF = filtered.groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Double]("cos")).max).toMap
    val bestU = unfiltered.groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Double]("cos")).max).toMap
    bestF.foreach { case (q, c) =>
      assert(c <= bestU(q), s"query $q: filtering improved the best cosine")
    }
  }

  test("q182: candidate volume and recall are monotone non-increasing " +
    "in rows-per-band; the served config's candidates cover q27's pairs") {
    val curve = graft.SparkEntry.queries("q182_band_recall_curve")(spark, sfDir)
      .orderBy(col("rows_per_band"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(curve.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    curve.foreach { case (r, nb, cand, truth, cap, recall) =>
      assert(nb == 16L / r)
      assert(cap <= truth && cap <= cand,
        s"captured must be bounded by truth and candidates at r=$r")
      assert(recall == cap * 1000L / truth)
    }
    assert(curve.map(_._3).sliding(2).forall(p => p(0) >= p(1)),
      "more rows per band must never ADD candidates")
    assert(curve.map(_._5).sliding(2).forall(p => p(0) >= p(1)),
      "more rows per band must never ADD captured truth")
    // the served configuration (r = RowsPerBand) surfaces at least
    // every pair q27 verifies — q27's pairs ARE banded candidates that
    // passed the exact check
    val served = curve.find(_._1 == graft.llm.Dedup.RowsPerBand.toLong).get
    val q27 = graft.SparkEntry.queries("q27_minhash_neardup")(spark, sfDir)
      .count()
    assert(served._3 >= q27,
      "served-config candidates must cover the verified q27 pairs")
    assert(served._5 <= served._4)
  }
}
