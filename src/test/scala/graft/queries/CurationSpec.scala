package graft.queries

import graft.SparkSpec

/** q75's composed verdict must agree flag-by-flag with the standalone
  * queries it composes (q74 repetition, q62 sampling) and with its own
  * conjunction — cross-query consistency over real sf0.001 documents.
  */
class CurationSpec extends SparkSpec {

  test("q75 flags agree with q74/q62 and the verdict is the conjunction") {
    val rep = TextStatsQueries.repetition(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(4), r.getBoolean(5)))
      .toMap // doc_id -> (dup_tok_frac, top_bigram_share, keep)
    val sampled = TextStatsQueries.stratifiedSample(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val rows = TextStatsQueries.curationVerdict(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (id, canon, lang, qual, repK, sampK, verdict) =
        (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))
      val (dupTok, topBi, q74keep) = rep(id)
      assert(repK == q74keep, s"doc $id: rep_keep $repK vs q74 $q74keep")
      assert(repK == (topBi <= 0.18 && dupTok <= 0.60))
      assert(sampK == sampled.contains(id), s"doc $id: sample_keep mismatch")
      assert(verdict == (canon && lang && qual && repK && sampK))
    }
    // the gates must actually discriminate on this corpus
    assert(rows.exists(_.getBoolean(6)) && rows.exists(!_.getBoolean(6)))
  }
}
