package graft.queries

import graft.SparkSpec

/** q157 evidence: the tier frame is exactly q34's scored corpus
  * re-bucketed (same docs, same scores), and the cumulative columns
  * telescope to the corpus totals.
  */
class QualityBudgetSpec extends SparkSpec {

  test("q157 tiers partition q34's corpus; cumulatives telescope") {
    val scored = graft.SparkEntry.queries("q34_quality_score")(spark, sfDir)
      .select("n_tokens", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val exp = scored
      .groupBy { case (_, sc) => math.min(9L, math.floor(sc * 10).toLong) }
      .view.mapValues(rs => (rs.length.toLong, rs.map(_._1).sum)).toMap
    val rows = graft.SparkEntry.queries("q157_quality_budget")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSet == exp.keySet, "tier set mismatch")
    rows.foreach { case (t, nd, ntk, _, _) =>
      assert((nd, ntk) == exp(t), s"tier $t mass") }
    // descending tiers; cumulatives are exact running sums ending at totals
    assert(rows.map(_._1).sameElements(rows.map(_._1).sortBy(-_)))
    var (cd, ct) = (0L, 0L)
    rows.foreach { case (t, nd, ntk, cum_d, cum_t) =>
      cd += nd; ct += ntk
      assert(cum_d == cd && cum_t == ct, s"tier $t cumulative")
    }
    assert(cd == scored.length.toLong, "cumulative must end at corpus size")
    assert(rows.length > 1, "one tier only — vacuous curve at test scale")
  }
}
