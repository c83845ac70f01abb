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

  test("q182 on a dup-free corpus: the curve is a DEFINED zero, not " +
    "null/divide-by-zero (r11 ADVICE — n_truth = 0 guard)") {
    // three documents with disjoint vocabularies: no pair reaches
    // exact Jaccard >= 0.5, so the truth set is empty — unguarded,
    // Spark's `div` nulls recall_milli while the DuckDB oracle's `//`
    // raises division-by-zero
    val tmp = java.nio.file.Files.createTempDirectory("q182_nodup").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "web", 46L),
      (1L, "one two three four five six seven eight nine", "en", "web", 45L),
      (2L, "red orange yellow green blue indigo violet hue", "en", "web", 47L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val curve = DedupQueries.bandRecallCurve(spark, tmp)
      .orderBy(col("rows_per_band")).collect()
    assert(curve.length == 5)
    curve.foreach { r =>
      assert(r.getAs[Long]("n_truth") == 0L, "witness: truth must be empty")
      assert(!r.isNullAt(r.fieldIndex("recall_milli")),
        "recall_milli must be defined on a dup-free corpus")
      assert(r.getAs[Long]("recall_milli") == 0L)
      assert(r.getAs[Long]("n_captured") == 0L)
    }
  }
}
