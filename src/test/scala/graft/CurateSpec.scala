package graft

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed CurateMain pipeline must agree with the standalone
  * queries it chains: every survivor passes each gate individually,
  * every gate's rejects are absent, and the whole job stays inside two
  * keyed shuffles (digest window + pack window).
  */
class CurateSpec extends SparkSpec {

  test("curated survivors are exactly the docs passing every standalone gate") {
    val out = CurateMain.curated(spark, sfDir)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet

    // recompute the gates from the standalone query surface
    val verdict = graft.queries.TextStatsQueries.curationVerdict(spark, sfDir)
      .collect().map(r => (r.getLong(0),
        r.getBoolean(3) /* quality_ok */, r.getBoolean(5) /* sample_keep */))
    val quality = verdict.filter(_._2).map(_._1).toSet
    val sampled = verdict.filter(_._3).map(_._1).toSet
    val repOk = graft.queries.TextStatsQueries.repetition(spark, sfDir)
      .where(col("dup_tok_frac") <= 0.60)
      .collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(quality) && kept.subsetOf(sampled) &&
      kept.subsetOf(repOk))
    // nothing that passes ALL gates (and survives dedup) is missing:
    // the corpus has no exact dups after the sampling gate, so the
    // intersection is the expected survivor set
    val expected = quality.intersect(sampled).intersect(repOk)
    val dups = Tables.documents(spark, sfDir)
      .groupBy(md5(col("text"))).count().where(col("count") > 1).count()
    if (dups == 0) assert(kept == expected)
    else assert(kept.subsetOf(expected))
    assert(kept.nonEmpty)
  }

  test("packs reassemble each source's surviving token stream exactly") {
    val out = CurateMain.curated(spark, sfDir)
    val perSource = out.groupBy("source").agg(sum("n_tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val packs = out.groupBy("source", "pack_id").agg(sum("n_tok").as("t"))
      .groupBy("source").agg(sum("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource == packs)
    // pack ids start at 0 and are contiguous per source
    out.select("source", "pack_id").distinct().collect()
      .groupBy(_.getString(0)).foreach { case (src, rs) =>
        val ids = rs.map(_.getLong(1)).sorted
        assert(ids.sameElements(0L until ids.length), src)
      }
  }

  test("the composed plan holds at two keyed shuffles before the write") {
    val df = CurateMain.curated(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalPlan = p.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges")
    val windows = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec
    }
    assert(windows.nonEmpty && windows.forall(_.nonEmpty),
      "both windows must be partitioned")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }
}
