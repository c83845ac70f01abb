package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch (q166/q167) structural guarantees — the properties
  * that make the sketch usable at 100 TB, proven on real corpus data:
  * the merge law (per-partition partial sketches summed cell-wise ARE
  * the global sketch, for any split of the corpus) and the one-sided
  * error bound (an estimate never undercounts).
  */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def tok(pred: org.apache.spark.sql.Column) =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .where(pred)
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .where(col("t") =!= "")

  private def gridOf(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
    df.select("j", "bucket", "cnt").as[(Long, Long, Long)]
      .collect().map { case (j, b, c) => (j, b) -> c }.toMap

  test("q166 sketch is a monoid: sketch(evens) + sketch(odds) == sketch(all)") {
    val full = gridOf(TextStatsQueries.cmsSketchOver(tok(lit(true))))
    val a = TextStatsQueries.cmsSketchOver(tok(col("doc_id") % 2 === 0))
    val b = TextStatsQueries.cmsSketchOver(tok(col("doc_id") % 2 === 1))
    val merged = gridOf(a.union(b)
      .groupBy(col("j"), col("bucket")).agg(sum(col("cnt")).as("cnt")))
    assert(merged == full,
      "cell-wise sum of the half-corpus sketches must equal the full sketch")
  }

  test("q166 every hash row accounts for every token occurrence") {
    val n = tok(lit(true)).count()
    val perRow = TextStatsQueries.cmsSketch(spark, sfDir)
      .groupBy(col("j")).agg(sum(col("cnt")).as("tot"))
      .select("j", "tot").as[(Long, Long)].collect().toMap
    assert(perRow.keySet == Set(0L, 1L, 2L, 3L))
    assert(perRow.values.forall(_ == n),
      s"each of the 4 rows must sum to the $n token occurrences: $perRow")
  }

  test("q167 estimates never undercount, and some collision exists to audit") {
    val rows = graft.SparkEntry.queries("q167_cms_estimate")(spark, sfDir)
      .select("exact_cnt", "cms_est", "overcount").as[(Long, Long, Long)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, est, over) =>
      assert(est >= exact && over == est - exact,
        s"CMS one-sided bound violated: exact=$exact est=$est")
    }
    // w=64 under this vocabulary is chosen to leave real collision
    // mass in the audit — a zero-overcount corpus would make q167
    // vacuous as a test of the estimate path
    info(s"${rows.count(_._3 > 0)} of ${rows.length} terms show collision mass")
  }
}
