package graft.queries

import graft.SparkSpec

/** q188 winnowed fingerprints re-derived from first principles: an
  * independent Scala winnower (md5-derived gram hashes, rightmost
  * minimal hash per window, the textbook loop — no PosPack trick)
  * must agree with the query's windowed-min plan on every document,
  * and the density must sit near the 2/(w+1) theory.
  */
class WinnowSpec extends SparkSpec {

  private val K = 4
  private val W = 4
  private val HashMod = 1L << 40

  private def h40(gram: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(gram.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % HashMod
  }

  /** The textbook winnower: for each full window, keep the RIGHTMOST
    * position of the minimal hash; return the distinct selected
    * positions. */
  private def winnow(tokens: Array[String]): Set[Int] = {
    val hs = (0 to tokens.length - K)
      .map(i => h40(tokens.slice(i, i + K).mkString(" "))).toArray
    (0 to hs.length - W).flatMap { j =>
      val win = hs.slice(j, j + W)
      val m = win.min
      Some(j + win.lastIndexWhere(_ == m))
    }.toSet
  }

  test("q188 equals the textbook winnower per document; density near 2/(w+1)") {
    val docs = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "split(trim(text), '\\\\s+') as w")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    val expSel: Map[Long, Set[Int]] =
      docs.view.mapValues(w =>
        if (w.length >= K + W - 1) winnow(w) else Set.empty[Int]).toMap
    val expH: Map[Long, Set[Long]] = docs.map { case (id, w) =>
      id -> expSel(id).map(i => h40(w.slice(i, i + K).mkString(" ")))
    }
    val sharedH: Set[Long] = expH.toSeq.flatMap { case (id, hs) => hs.map(id -> _) }
      .groupBy(_._2).collect { case (h, ds) if ds.map(_._1).distinct.size >= 2 => h }
      .toSet

    val rows = AnalyticsQueries.winnowFingerprint(spark, sfDir).collect()
    assert(rows.length == docs.size)
    var fpSum = 0L; var gramSum = 0L
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == math.max(docs(id).length - (K - 1), 0).toLong)
      // the query counts distinct PACKS = distinct selected positions
      assert(r.getLong(2) == expSel(id).size.toLong, s"doc $id n_fp")
      assert(r.getLong(3) == expH(id).count(sharedH).toLong, s"doc $id n_shared")
      assert(r.getDouble(4) ==
        (if (r.getLong(1) > 0) r.getLong(2).toDouble / r.getLong(1) else 0.0))
      fpSum += r.getLong(2); gramSum += r.getLong(1)
    }
    val density = fpSum.toDouble / gramSum
    assert(density > 0.3 && density < 0.55,
      s"winnowing density $density far from the 2/(w+1)=0.4 theory")
    // the sampled index must still see duplication on this corpus
    assert(rows.exists(_.getLong(3) > 0))
  }

  test("q191 pair report equals the textbook pairing with the df cap") {
    val docs = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "split(trim(text), '\\\\s+') as w")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    val fps: Map[Long, Set[Long]] = docs.map { case (id, w) =>
      id -> (if (w.length >= K + W - 1)
        winnow(w).map(i => h40(w.slice(i, i + K).mkString(" ")))
      else Set.empty[Long])
    }
    val df = fps.toSeq.flatMap { case (id, hs) => hs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val rare = df.collect { case (h, n) if n <= 10 => h }.toSet
    val expected = (for {
      Seq(a, b) <- fps.keys.toSeq.sorted.combinations(2)
      shared = (fps(a) & fps(b) & rare).size
      if shared >= 3
    } yield (a, b) -> (shared, fps(a).size, fps(b).size)).toMap

    val rows = AnalyticsQueries.winnowMatches(spark, sfDir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      expected.keySet, "pair set differs from the textbook pairing")
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val (shared, na, nb) = expected(key)
      assert(r.getLong(2) == shared.toLong && r.getLong(3) == na.toLong &&
        r.getLong(4) == nb.toLong, s"pair $key counts")
      assert(r.getDouble(5) == shared.toDouble / math.min(na, nb))
    }
    assert(rows.nonEmpty, "the corpus's near-dups must surface pairs")
  }

  test("q195 clusters equal the textbook transitive closure of the " +
    "q191 pairing") {
    val docs = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "split(trim(text), '\\\\s+') as w")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    val fps: Map[Long, Set[Long]] = docs.map { case (id, w) =>
      id -> (if (w.length >= K + W - 1)
        winnow(w).map(i => h40(w.slice(i, i + K).mkString(" ")))
      else Set.empty[Long])
    }
    val df = fps.toSeq.flatMap { case (id, hs) => hs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val rare = df.collect { case (h, n) if n <= 10 => h }.toSet
    val edges = (for {
      Seq(a, b) <- fps.keys.toSeq.sorted.combinations(2)
      if (fps(a) & fps(b) & rare).size >= 3
    } yield (a, b)).toSeq
    // textbook closure: iterate min-label over the undirected graph
    var comp = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => id -> id).toMap
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (a, b) =>
        val m = math.min(comp(a), comp(b))
        if (comp(a) != m) { comp += a -> m; changed = true }
        if (comp(b) != m) { comp += b -> m; changed = true }
      }
    }
    val rows = AnalyticsQueries.winnowClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows == comp,
      "q195 labels must equal the textbook transitive closure")
    assert(rows.nonEmpty && rows.exists { case (id, c) => id != c },
      "witness: at least one non-singleton component")
  }

  test("q199 source matrix equals the hand rollup of the q191 pairs") {
    val srcs = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = AnalyticsQueries.winnowMatches(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = pairs.groupBy { case (a, b, _) =>
      val (sa, sb) = (srcs(a), srcs(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.map { case (k, ps) =>
      k -> ((ps.size.toLong, ps.map(_._3).sum))
    }
    val rows = AnalyticsQueries.winnowSrcMatrix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(rows == expected,
      "q199 must equal the hand rollup of the q191 pair list")
    assert(rows.nonEmpty, "witness: matched pairs must span sources")
  }
}
