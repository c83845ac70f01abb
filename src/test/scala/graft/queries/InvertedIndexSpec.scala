package graft.queries

import graft.SparkSpec

/** Independent (non-DuckDB) evidence for q151: a brute in-memory index
  * build over the same whitespace tokenization, plus the structural
  * invariants a consumer relies on (sorted distinct head, df/extent/gap
  * consistency) and the df-cap rule for gap_max (r7 verdict item 2: the
  * one full-list stat is computed only under the cap, NULL above it).
  */
class InvertedIndexSpec extends SparkSpec {

  private def brute = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toVector
        .filter(_.nonEmpty))
      .toSeq
    docs
      .flatMap { case (id, w) => w.map(t => (t, id)) }
      .groupBy(_._1).view
      .mapValues { occ =>
        val byDoc = occ.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val sorted = byDoc.keys.toSeq.sorted
        val gapMax =
          if (sorted.size < 2) 0L
          else sorted.sliding(2).map { case Seq(a, b) => b - a }.max
        (byDoc.size.toLong, byDoc.values.sum, sorted.head, sorted.last,
          gapMax, sorted.take(8).mkString(","))
      }
      .toMap
  }

  test("q151 index stats equal a brute build; structure invariants hold") {
    val df = TextStatsQueries.invertedIndex(spark, sfDir)
    val got = df.collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getString(6)))
    }.toMap
    assert(got == brute, "index metadata differs from brute build")
    assert(got.nonEmpty, "corpus must index at least one term (witness)")
    assert(got.values.exists(_._5 > 0L),
      "some term must have a non-trivial posting gap (witness)")
    got.foreach { case (t, (dfc, tft, lo, hi, gapMax, head)) =>
      val ids = head.split(",").map(_.toLong).toSeq
      assert(ids == ids.sorted && ids.distinct == ids,
        s"$t: head must be sorted distinct doc ids")
      assert(ids.size.toLong == math.min(dfc, 8L), s"$t: head length")
      assert(tft >= dfc, s"$t: total tf below df is impossible")
      assert(lo == ids.head && lo <= hi, s"$t: extent mismatch")
      assert(gapMax <= hi - lo, s"$t: gap above extent is impossible")
    }
  }

  test("q151 gap_max is NULL above the df cap, exact at or below it") {
    // force a cap that splits the vocab: the smallest df sits under it,
    // anything rarer than the most common term sits over it
    val cap = brute.values.map(_._1).min
    val rows = TextStatsQueries.invertedIndexCapped(spark, sfDir, cap)
      .collect()
    assert(rows.exists(_.getLong(1) > cap),
      "witness: some term must exceed the forced cap")
    assert(rows.exists(_.getLong(1) <= cap),
      "witness: some term must sit under the forced cap")
    rows.foreach { r =>
      val (term, df) = (r.getString(0), r.getLong(1))
      if (df > cap)
        assert(r.isNullAt(5), s"$term: gap_max must be NULL above the cap")
      else
        assert(!r.isNullAt(5) && r.getLong(5) == brute(term)._5,
          s"$term: capped build must stay exact under the cap")
    }
  }
}
