package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, explode, split, trim}

/** The r14 text-analytics additions — χ² keyness (q184), Hellinger
  * source distance (q185), Luhn-gated card detection (q186), and
  * collocation lift (q187) — re-derived from first principles on the
  * sf0.001 corpus: independent Scala recomputation of every statistic,
  * plus the structural properties (per-source rank windows, pair
  * symmetry, checksum ground truth) the oracle hash alone would not
  * explain if it ever went red.
  */
class KeynessSpec extends SparkSpec {

  /** (source, term) -> tf over the whitespace-split corpus — the
    * shared input every recomputation derives from. */
  private lazy val tf: Map[(String, String), Long] =
    graft.Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .where(col("t") =!= "")
      .groupBy("source", "t").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("q184 keyness: χ² recomputed from the contingency table, top-10 per source") {
    val termTot = tf.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val srcTot = tf.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nAll = srcTot.values.sum
    val rows = TextStatsQueries.keyness(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getString(0))
    assert(bySrc.keySet == srcTot.keySet, "every source reports")
    bySrc.foreach { case (src, rs) =>
      assert(rs.length <= 10 && rs.map(_.getLong(4)).toSeq == (1L to rs.length))
    }
    rows.foreach { r =>
      val (src, term, a) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(a >= 5, s"$src/$term below the tf floor")
      assert(tf((src, term)) == a)
      val (da, db) = (a.toDouble, (termTot(term) - a).toDouble)
      val (dc, dd) = ((srcTot(src) - a).toDouble,
        (nAll - srcTot(src) - termTot(term) + a).toDouble)
      val del = da * dd - db * dc
      val chi2 = nAll.toDouble * del * del /
        ((da + db) * (dc + dd) * (da + dc) * (db + dd))
      assert(r.getDouble(3) == chi2, s"$src/$term χ² ${r.getDouble(3)} vs $chi2")
    }
  }

  test("q185 Hellinger: BC recomputed through the DECIMAL(18,9) rule, all pairs") {
    val srcTot = tf.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val sources = srcTot.keySet.toSeq.sorted
    val rows = TextStatsQueries.srcHellinger(spark, sfDir).collect()
    // every source pair shares vocabulary on this corpus
    assert(rows.length == sources.combinations(2).size)
    rows.foreach { r =>
      val (s1, s2) = (r.getString(0), r.getString(1))
      assert(s1 < s2)
      val shared = tf.keys.collect { case (`s1`, t) if tf.contains((s2, t)) => t }
      assert(r.getLong(2) == shared.size.toLong)
      val bcDec = shared.toSeq.map { t =>
        val p1 = tf((s1, t)).toDouble / srcTot(s1).toDouble
        val p2 = tf((s2, t)).toDouble / srcTot(s2).toDouble
        BigDecimal(math.sqrt(p1 * p2))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      val bc = bcDec.toDouble
      assert(r.getDouble(3) == bc, s"$s1/$s2 bc ${r.getDouble(3)} vs $bc")
      assert(r.getDouble(4) == math.sqrt(1.0 - bc))
      assert(bc > 0.0 && bc < 1.0, s"distinct sources must differ: $bc")
    }
  }

  test("q186 Luhn: validity matches an independent checksum, row-local plan") {
    def luhn(s: String): Boolean =
      s.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum % 10 == 0
    val df = CurationQueries.luhnPii(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 500)
    var nValidTotal = 0L
    rows.foreach { r =>
      val id = r.getLong(0)
      val expCands = Seq(
        if (id % 3 == 0)
          Some(f"${(id * 7919L) % 1000000000000000L}%015d" + (id % 10))
        else None,
        if (id % 7 == 0) Some("4111111111111111") else None).flatten
      assert(r.getLong(1) == expCands.length.toLong, s"doc $id n_cand")
      val expValid = expCands.count(luhn)
      assert(r.getLong(2) == expValid.toLong, s"doc $id n_valid")
      assert(r.getBoolean(3) == (expValid > 0))
      nValidTotal += expValid
    }
    // the checksum must discriminate: some pseudo-PANs fail, the test
    // PAN always passes — both classes present on this corpus
    assert(nValidTotal > 0)
    assert(rows.exists(r => r.getLong(1) > r.getLong(2)),
      "at least one candidate must fail the checksum")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning"),
      "detection is row-local; only the presentation sort may exchange")
  }

  test("q187 collocation lift: recomputed from document frequencies, ordered") {
    val dt = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .where(col("t") =!= "").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val dfT = dt.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byDoc = dt.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nDocs = 500L
    val cab = byDoc.values.toSeq
      .flatMap(ts => ts.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = TextStatsQueries.collocLift(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { r =>
      val (ta, tb, c) = (r.getString(0), r.getString(1), r.getLong(2))
      assert(ta < tb && c >= 10)
      assert(cab((ta, tb)) == c)
      assert(r.getLong(3) == dfT(ta) && r.getLong(4) == dfT(tb))
      val lift = (nDocs * c).toDouble / (dfT(ta).toDouble * dfT(tb).toDouble)
      assert(r.getDouble(5) == lift)
    }
    val lifts = rows.map(_.getDouble(5)).toSeq
    assert(lifts == lifts.sorted.reverse, "descending by lift")
  }
}
