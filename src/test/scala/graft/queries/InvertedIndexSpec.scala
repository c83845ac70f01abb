package graft.queries

import graft.SparkSpec

/** Independent (non-DuckDB) evidence for q151: a brute in-memory index
  * build over the same whitespace tokenization, plus the structural
  * invariants a consumer relies on (sorted distinct head, df/extent/gap
  * consistency, plan free of joins).
  */
class InvertedIndexSpec extends SparkSpec {

  test("q151 index stats equal a brute build; structure invariants hold") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toVector
        .filter(_.nonEmpty))
      .toSeq
    val brute = docs
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
    // scale guard: aggregation + one per-term window, never a join
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"), "q151 must not join")
  }
}
