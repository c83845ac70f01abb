package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native sorted-merge AS-OF join (GraftAsOfJoin → GraftAsOfJoinExec
  * via the injected strategy): semantics pinned against hand-computed
  * cases and against q61's window composition on real events; plan shape
  * pinned to "two exchanges, one merge, no window / no candidate join".
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(
    // key, ts, quote
    ("a", 1L, 10.0), ("a", 5L, 11.0), ("a", 9L, 12.0),
    ("b", 4L, 20.0),
    ("c", 7L, 30.0)
  ).toDF("k", "t", "quote")

  private def trades = Seq(
    ("a", 0L), ("a", 1L), ("a", 6L), ("a", 99L),
    ("b", 3L), ("b", 4L),
    ("d", 5L)
  ).toDF("tk", "tt")

  test("latest-at-or-before semantics, left outer, hand-computed") {
    val q = AsOf.prefixed(quotes, "q_")
    val out = AsOf.join(trades, q, Seq("tk" -> "q_k"), ("tt", "q_t"))
      .select(col("tk"), col("tt"), col("q_t"), col("q_quote"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSet
    assert(out == Set(
      ("a", 0L, -1L, -1.0),   // before any quote
      ("a", 1L, 1L, 10.0),    // exact-tie matches (<=)
      ("a", 6L, 5L, 11.0),    // latest at-or-before, not first
      ("a", 99L, 9L, 12.0),   // far future → last quote
      ("b", 3L, -1L, -1.0),
      ("b", 4L, 4L, 20.0),
      ("d", 5L, -1L, -1.0)))  // key with no right rows at all
  }

  test("right ties on ts: the tiebreak-last row wins") {
    val dup = Seq(("a", 5L, 1L), ("a", 5L, 2L), ("a", 5L, 3L))
      .toDF("k", "t", "id")
    val out = AsOf.join(Seq(("a", 6L)).toDF("tk", "tt"),
        AsOf.prefixed(dup, "r_"),
        Seq("tk" -> "r_k"), ("tt", "r_t"), rightTiebreak = Seq("r_id"))
      .select(col("r_id")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("q84 native result equals q61's window composition on real events") {
    val native = graft.queries.WindowQueries.asofNative(spark, sfDir)
      .collect().map(_.toString)
    val composed = graft.queries.WindowQueries.asofJoin(spark, sfDir)
      .collect().map(_.toString)
    assert(native.length == composed.length && native.length > 0)
    assert(native.sameElements(composed))
  }

  test("plan shape: one merge operator, no window, no join fallback") {
    val df = graft.queries.WindowQueries.asofNative(spark, sfDir)
    df.collect() // bind AQE final plan
    val p = df.queryExecution.executedPlan.toString
    // physical nodes print without the Exec suffix
    assert(p.contains("GraftAsOfJoin"), p.take(800))
    assert(!p.contains("WindowExec") && !p.contains("SortMergeJoin") &&
      !p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(800))
    // exactly one exchange per side feeds the merge (plus the final
    // presentation sort's exchange) — never more; count only the AQE
    // final plan, the string repeats everything under "== Initial Plan =="
    val finalPlan = p.split("== Initial Plan ==").head
    val exchanges = "Exchange ".r.findAllIn(finalPlan).size
    assert(exchanges <= 3, s"expected <=3 exchanges, got $exchanges\n${finalPlan.take(800)}")
  }

  test("empty right side still yields left-outer rows") {
    val out = AsOf.join(trades,
        AsOf.prefixed(quotes.where(col("t") < 0), "e_"),
        Seq("tk" -> "e_k"), ("tt", "e_t"))
      .collect()
    assert(out.length == 7 && out.forall(_.isNullAt(3)))
  }
}
