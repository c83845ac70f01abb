package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-query invariants for the round-10 curation audits — the
  * DuckDB oracle proves bit-parity; these pin the SEMANTIC claims the
  * docs make against the rest of the dedup family. */
class NoveltyCalibrationSpec extends SparkSpec {
  import spark.implicits._

  test("q175 candidates cover every verified near-dup pair; estimates bounded") {
    val cal = graft.SparkEntry.queries("q175_minhash_calibration")(spark, sfDir)
      .select("doc_a", "doc_b", "n_match", "est_sim", "jaccard")
      .collect()
    val pairs = cal.map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = graft.SparkEntry.queries("q27_minhash_neardup")(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(verified.nonEmpty && verified.subsetOf(pairs),
      "every pair q27 verifies must appear in the calibration audit " +
        "(same banded candidate stage)")
    cal.foreach { r =>
      val (m, est, jac) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(m >= 0 && m <= 16 && est >= 0.0 && est <= 1.0 &&
        jac >= 0.0 && jac <= 1.0, s"out-of-range row: $r")
    }
    // calibration sanity on this corpus (deterministic: fixed corpus,
    // fixed hash family): near-dup pairs must estimate higher on
    // average than the sub-threshold candidates they share bands with
    val (hi, lo) = cal.partition(_.getDouble(4) >= 0.5)
    assert(hi.nonEmpty, "witness: the corpus has verified near-dup pairs")
    if (lo.nonEmpty) {
      def meanEst(rs: Array[org.apache.spark.sql.Row]) =
        rs.map(_.getDouble(3)).sum / rs.length
      assert(meanEst(hi) > meanEst(lo),
        "the estimator must separate near-dups from band-coincidences")
    }
  }

  test("q177 novelty: near-dup docs share text; values bounded") {
    val nov = graft.SparkEntry.queries("q177_ngram_novelty")(spark, sfDir)
      .select("doc_id", "n_shingles", "n_shared", "novelty_milli")
      .collect()
    nov.foreach { r =>
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000 &&
        r.getLong(2) <= r.getLong(1), s"inconsistent row: $r")
    }
    // a doc in a verified near-dup pair (Jaccard >= 0.5) shares at
    // least one shingle with its partner, so its novelty is < 1000
    val dupDocs = graft.SparkEntry.queries("q27_minhash_neardup")(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    assert(dupDocs.nonEmpty, "witness: the corpus has near-dup docs")
    val novOf = nov.map(r => r.getLong(0) -> r.getLong(3)).toMap
    dupDocs.foreach { id =>
      assert(novOf(id) < 1000L,
        s"near-dup doc $id claims fully novel text")
    }
  }

  test("q176 efficiency is consistent with q79's packs") {
    val eff = graft.SparkEntry.queries("q176_pack_efficiency")(spark, sfDir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_packs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("util_milli"))).toMap
    val packs = graft.SparkEntry.queries("q79_sequence_pack")(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("np"), sum(col("pack_tokens")).as("tt"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(eff.keySet == packs.keySet)
    eff.foreach { case (src, (np, tt, util)) =>
      assert((np, tt) == packs(src), s"$src: pack rollup disagrees with q79")
      assert(util == tt * 1000 / (np * 256L), s"$src: utilization arithmetic")
      assert(util > 0 && util <= 2000, s"$src: implausible utilization $util")
    }
  }
}
