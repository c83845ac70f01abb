package graft.queries

import graft.SparkSpec
import graft.llm.Dedup

/** q192 prefix-filtered similarity join re-derived from first
  * principles: a brute ALL-PAIRS Scala recomputation (no prefix
  * filter, no Spark) of every shingle-set pair at Jaccard ≥ 1/2 must
  * equal the query's output exactly — the prefix-filter theorem's
  * losslessness, witnessed rather than assumed.
  */
class PrefixSimJoinSpec extends SparkSpec {

  private def md5x(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % Dedup.MinHashP
  }

  test("q192 equals the brute all-pairs Jaccard >= 1/2 join") {
    val docs = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "split(trim(text), '\\\\s+') as w")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    // x-hashed distinct 3-gram shingle sets — the query's universe
    val sets: Map[Long, Set[Long]] = docs.map { case (id, w) =>
      id -> (if (w.length >= 3)
        (0 to w.length - 3).map(i => md5x(w.slice(i, i + 3).mkString(" ")))
          .toSet
      else Set.empty[Long])
    }
    val expected = (for {
      Seq(a, b) <- sets.keys.toSeq.sorted.combinations(2)
      c = (sets(a) & sets(b)).size
      na = sets(a).size; nb = sets(b).size
      if 3 * c >= na + nb && na + nb > 0
    } yield (a, b) -> (c.toLong, na.toLong, nb.toLong)).toMap

    val rows = DedupQueries.simJoinPrefix(spark, sfDir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      expected.keySet,
      "prefix-filtered pair set must equal the brute all-pairs set " +
        "(losslessness)")
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val (c, na, nb) = expected(key)
      assert(r.getLong(2) == c && r.getLong(3) == na && r.getLong(4) == nb,
        s"pair $key counts")
      assert(r.getDouble(5) == c.toDouble / (na + nb - c), s"pair $key jaccard")
    }
    assert(rows.nonEmpty, "witness: the corpus's near-dups must qualify")
  }
}
