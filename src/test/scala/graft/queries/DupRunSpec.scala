package graft.queries

import graft.SparkSpec

/** q196 longest duplicated run re-derived from first principles: an
  * independent Scala pass (md5 8-gram hashes, cross-doc duplicate set,
  * a direct longest-consecutive-run scan — no gaps-and-islands trick)
  * must agree with the query on every document.
  */
class DupRunSpec extends SparkSpec {

  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("q196 equals the textbook longest-duplicated-run scan per doc") {
    val G = 8
    val docs = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "split(trim(text), '\\\\s+') as w")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    val grams: Map[Long, Array[Long]] = docs.view.mapValues { w =>
      if (w.length >= G)
        (0 to w.length - G).map(i => h60(w.slice(i, i + G).mkString(" ")))
          .toArray
      else Array.empty[Long]
    }.toMap
    val dup: Set[Long] = grams.toSeq
      .flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).collect { case (g, ds) if ds.map(_._2).distinct.size >= 2 => g }
      .toSet
    // direct scan: longest consecutive stretch of duplicated gram
    // starts, and the count of maximal stretches
    val expected: Map[Long, (Long, Long)] = grams.map { case (id, gs) =>
      val flags = gs.map(dup)
      var best = 0; var cur = 0; var runs = 0
      flags.foreach { f =>
        if (f) { cur += 1; if (cur == 1) runs += 1; best = math.max(best, cur) }
        else cur = 0
      }
      id -> (if (best == 0) (0L, 0L) else ((best + G - 1).toLong, runs.toLong))
    }

    val rows = AnalyticsQueries.dupLongestRun(spark, sfDir).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == docs(id).length.toLong, s"doc $id n_tok")
      assert((r.getLong(2), r.getLong(3)) == expected(id),
        s"doc $id (span, runs): got (${r.getLong(2)}, ${r.getLong(3)}), " +
          s"want ${expected(id)}")
    }
    assert(rows.exists(_.getLong(2) > 0),
      "witness: the corpus must contain a duplicated span")
  }
}
