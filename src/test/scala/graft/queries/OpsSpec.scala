package graft.queries

import graft.SparkSpec

/** Independent evidence for the operational queries: q110's digests
  * recomputed from raw parquet in plain Scala (plus the
  * mutation-detection property a checksum exists for) and q111's
  * profile against brute counts.
  */
class OpsSpec extends SparkSpec {

  /** The engine-wide 60-bit md5 idiom, recomputed independently. */
  private def h60(tag: String, v: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((tag + "|" + v).getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map("%02x".format(_)).mkString.take(15), 16)
  }

  private val CkMod = BigInt("2305843009213693951")

  test("q110: digests equal a Scala recomputation; one-char flips are detected") {
    val res = OpsQueries.tableChecksum(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => Seq(r.getLong(0).toString, r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4).toString).mkString("|"))
    def digest(keys: Seq[String], tag: String): (Long, Long, Long) = {
      val hs = keys.map(k => h60(tag, k))
      ((keys.size.toLong,
        (hs.map(BigInt(_)).sum mod CkMod).toLong,
        hs.reduce(_ ^ _)))
    }
    assert(res("documents") == digest(docs.toSeq, "ck|documents"))
    // detection: mutate one character of one row → both digests move
    val mutated = docs.toSeq.updated(0, docs(0).dropRight(1) + "X")
    val (_, mSum, mXor) = digest(mutated, "ck|documents")
    assert(mSum != res("documents")._2 && mXor != res("documents")._3)
    // order independence: the digest of a shuffled copy is identical
    val shuffled = new scala.util.Random(11).shuffle(docs.toSeq)
    assert(digest(shuffled, "ck|documents") == res("documents"))
    assert(res.keySet == Set("documents", "orders", "lineitem"))
  }

  test("q117: cells cover every row and are tight in BOTH dimensions") {
    val cells = OpsQueries.zorderCells(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_partkey", "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cells.map(_._2).sum == li.length, "every row must land in a cell")
    assert(cells.length > 1 && cells.length <= 256,
      s"${cells.length} cells — expected a multi-cell Morton grid of <= 256")
    val (pmn, pmx) = (li.map(_._1).min, li.map(_._1).max)
    val (smn, smx) = (li.map(_._2).min, li.map(_._2).max)
    def bp(p: Long) = ((p - pmn) * 16) / (pmx - pmn + 1)
    def bs(x: Long) = ((x - smn) * 16) / (smx - smn + 1)
    // THE z-order property: a cell's min/max stay inside one bucket of
    // EACH key, so footer stats prune on either predicate column — a
    // single-column sort would leave the other dimension full-range
    cells.foreach { case (z, _, minP, maxP, minS, maxS) =>
      assert(bp(minP) == bp(maxP), s"cell $z spans partkey buckets")
      assert(bs(minS) == bs(maxS), s"cell $z spans suppkey buckets")
      // and the cell id is exactly the interleave of those bucket ids
      val interleaved = (0 until 4).map(b =>
        (((bp(minP) >> b) & 1L) << (2 * b)) +
          (((bs(minS) >> b) & 1L) << (2 * b + 1))).sum
      assert(z == interleaved, s"cell $z != interleave($interleaved)")
    }
  }

  test("q120: files are contiguous zcell ranges near the row budget") {
    val plan = OpsQueries.compactionPlan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cells = OpsQueries.zorderCells(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(plan.map(t => (t._1, t._2)).toSeq == cells.toSeq,
      "q120 must plan exactly q117's cells")
    val total = cells.map(_._2).sum
    val budget = math.max(1L, (total + 7) / 8)
    // brute: greedy prefix packing
    var cum = 0L
    plan.foreach { case (z, n, fid) =>
      assert(fid == cum / budget, s"cell $z file_id $fid != ${cum / budget}")
      cum += n
    }
    // contiguity + bounded file count + multi-file witness
    val fids = plan.map(_._3)
    assert(fids.zip(fids.tail).forall { case (a, b) => a <= b },
      "file ids must be non-decreasing in zcell order")
    assert(fids.distinct.length <= 8 && fids.distinct.length >= 2,
      s"${fids.distinct.length} files — expected 2..8 at test scale")
    // each file's rows stay under budget + its last cell (greedy bound)
    plan.groupBy(_._3).foreach { case (f, cs) =>
      assert(cs.map(_._2).sum <= budget + cs.map(_._2).max,
        s"file $f overshoots the greedy budget bound")
    }
  }

  test("q127: skipping report equals brute overlap math and beats a sorted layout") {
    val res = OpsQueries.skippingReport(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))))
      .toMap
    val cells = OpsQueries.zorderCells(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))) // n, min_p, max_p, min_s, max_s
    val (pmn, pmx) = (cells.map(_._2).min, cells.map(_._3).max)
    val (smn, smx) = (cells.map(_._4).min, cells.map(_._5).max)
    val rowsTotal = cells.map(_._1).sum
    def pred(mn: Long, mx: Long, b: Long) =
      (mn + (b * (mx - mn + 1)) / 8, mn + ((b + 1) * (mx - mn + 1)) / 8 - 1)
    for (colName <- Seq("l_partkey", "l_suppkey"); b <- 0L until 8L) {
      val (mn, mx) = if (colName == "l_partkey") (pmn, pmx) else (smn, smx)
      val (lo, hi) = pred(mn, mx, b)
      val hitting = cells.filter { case (_, p0, p1, s0, s1) =>
        if (colName == "l_partkey") p0 <= hi && p1 >= lo
        else s0 <= hi && s1 >= lo
      }
      assert(res((colName, b)) ==
        ((lo, hi, hitting.length.toLong, hitting.map(_._1).sum,
          cells.length.toLong, rowsTotal)),
        s"$colName octile $b mismatch")
    }
    // THE layout claim: for SUPPKEY predicates the Morton grid scans a
    // fraction of rows, while a partkey-SORTED layout (8 contiguous
    // partkey-octile files, suppkey footers full-range) prunes nothing
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_suppkey").collect().map(_.getLong(0))
    for (b <- 0L until 8L) {
      val (_, _, _, zRows, _, _) = res(("l_suppkey", b))
      assert(zRows <= rowsTotal / 2,
        s"suppkey octile $b: z-layout scans $zRows of $rowsTotal — no skipping")
      val (lo, hi) = pred(smn, smx, b)
      // sorted-layout baseline: every file overlaps [smn, smx] ⊇ [lo, hi]
      assert(lo >= smn && hi <= smx && li.exists(v => v >= lo && v <= hi),
        "octile must be non-degenerate for the baseline comparison")
    }
  }

  test("q130: constraint report equals brute checks; violations are real, not asserted away") {
    val res = OpsQueries.constraintAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey", "l_linenumber", "l_quantity").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey", "o_orderstatus").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("c_custkey").collect().map(_.getLong(0)).toSet
    def uniq[K](keys: Seq[K]) = {
      val gs = keys.groupBy(identity).values.map(_.size.toLong)
      (gs.sum, gs.map(_ - 1).sum)
    }
    val okeys = ord.map(_._1).toSet
    val brute = Map(
      "pk_lineitem_orderkey_linenumber" -> uniq(li.map(t => (t._1, t._2)).toSeq),
      "pk_orders_orderkey" -> uniq(ord.map(_._1).toSeq),
      "fk_lineitem_orders" ->
        ((li.length.toLong, li.count(t => !okeys(t._1)).toLong)),
      "fk_orders_customer" ->
        ((ord.length.toLong, ord.count(t => !cust(t._2)).toLong)),
      "dom_quantity_nonneg" ->
        ((li.length.toLong, li.count(_._3 < 0.0).toLong)),
      "dom_orderstatus_known" ->
        ((ord.length.toLong, ord.count(t => !Set("F", "O", "P")(t._3)).toLong)))
    assert(res == brute, s"report differs:\n$res\n$brute")
    // the documented data fact: lineitem's key is non-unique — the
    // report must SHOW that, and at least one contract must be clean
    assert(res("pk_lineitem_orderkey_linenumber")._2 > 0L,
      "the known lineitem key duplication must surface as violations")
    assert(res.values.exists(_._2 == 0L), "no clean contract at all?")
  }

  test("q122: merge equals a brute CDC apply; last writer wins; deletes vanish") {
    val res = OpsQueries.mergeUpsert(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3))))
      .toMap
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val off = base.map(_._1).max + 1 // q122's derived insert-id offset
    val brute = scala.collection.mutable.Map.empty[Long, (String, String, Long)]
    base.foreach { case (id, text) =>
      val ops = Seq(
        if (id % 3 == 0) Some((1L, "U", s"v1 $text")) else None,
        if (id % 2 == 0) Some((2L, "U", s"v2 $text")) else None,
        if (id % 7 == 0) Some((3L, "D", "")) else None).flatten
      if (ops.isEmpty) brute(id) = (text, "K", 0L)
      else {
        val (v, op, t) = ops.maxBy(_._1)
        if (op != "D") brute(id) = (t, op, v)
      }
      if (id % 5 == 0) brute(id + off) = (s"new $text", "I", 2L)
    }
    assert(res == brute.toMap, "merge result differs from the brute CDC apply")
    // witnesses for each semantic: last-writer-wins, delete, insert, keep
    val ids = base.map(_._1).toSet
    val lww = ids.find(id => id % 6 == 0 && id % 7 != 0)
    assert(lww.exists(id => res(id)._1.startsWith("v2 ")),
      "an id hit by v1 and v2 must carry the v2 text")
    assert(ids.filter(_ % 7 == 0).forall(id => !res.contains(id)),
      "deleted keys must be absent")
    assert(ids.filter(_ % 5 == 0).forall(id => res.contains(id + off)),
      "inserted keys must be present")
    assert(ids.find(id => id % 2 != 0 && id % 3 != 0 && id % 7 != 0)
      .exists(id => res(id)._2 == "K"), "an untouched key must survive as-is")
  }

  test("q118: outlier verdicts equal an exact BigInt brute; witnesses exist") {
    val res = OpsQueries.outlierAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byG = ev.groupBy(_._1)
    assert(res.keySet == byG.keySet)
    var witnesses = 0L
    byG.foreach { case (g, rows) =>
      val xs = rows.map(t => BigInt(t._2))
      val n = BigInt(xs.length); val s = xs.sum; val q = xs.map(x => x * x).sum
      val hi = xs.count(x => { val d = n * x - s; d > 0 && d * d > 9 * (n * q - s * s) })
      val lo = xs.count(x => { val d = n * x - s; d < 0 && d * d > 9 * (n * q - s * s) })
      assert(res(g) == ((xs.length.toLong, hi.toLong, lo.toLong)),
        s"$g: got ${res(g)}, brute ($hi, $lo)")
      witnesses += hi + lo
    }
    assert(witnesses > 0, "no 3-sigma outlier at test scale — vacuous audit")
  }

  test("q111: profile equals brute counts; sketch degenerates to exact under k") {
    val res = OpsQueries.columnProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6)))).toMap
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type", "user_id",
        "CAST(CAST(value AS DECIMAL(18,2)) AS STRING) AS value", "props")
      .collect()
    def brute(i: Int): (Long, Long, Long) = {
      val vs = ev.map(r => if (r.isNullAt(i)) null else r.get(i).toString)
      (vs.length.toLong, vs.count(_ == null).toLong,
        vs.filter(_ != null).distinct.length.toLong)
    }
    for ((name, i) <- Seq("event_type" -> 0, "user_id" -> 1,
      "value" -> 2, "props" -> 3)) {
      val (n, nNull, kUsed, est, truth, relErr) = res(name)
      val (bn, bNull, bDistinct) = brute(i)
      assert(n == bn && nNull == bNull, s"$name counts")
      assert(truth == bDistinct, s"$name truth")
      if (kUsed < 64) {
        assert(est == truth.toDouble && relErr == 0.0,
          s"$name must be exact when distinct < k")
      } else assert(math.abs(relErr) < 0.6, s"$name rel_err $relErr")
    }
  }

  test("q135: skew profile equals brute per-key counting on every audited column") {
    val got = OpsQueries.skewAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    def brute(tbl: String, key: String): (Long, Long, Long, String) = {
      val ks = spark.read.parquet(s"$sfDir/$tbl.parquet")
        .selectExpr(s"CAST($key AS STRING) AS k").collect().map(_.getString(0))
      val cnt = ks.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val maxC = cnt.values.max
      // ties on the count break to the LARGER key string (arg-max order)
      val top = cnt.filter(_._2 == maxC).keys.max
      (ks.length.toLong, cnt.size.toLong, maxC, top)
    }
    val cases = Seq(
      "lineitem.l_orderkey" -> ("lineitem", "l_orderkey"),
      "lineitem.l_partkey" -> ("lineitem", "l_partkey"),
      "lineitem.l_suppkey" -> ("lineitem", "l_suppkey"),
      "events.user_id" -> ("events", "user_id"),
      "events.event_type" -> ("events", "event_type"))
    assert(got.keySet == cases.map(_._1).toSet)
    cases.foreach { case (name, (tbl, key)) =>
      assert(got(name) == brute(tbl, key), s"$name profile differs from brute")
    }
    // the report must expose real imbalance somewhere (l_orderkey groups
    // several lineitems per order — max_cnt > 1 while user_id is sparse)
    assert(got("lineitem.l_orderkey")._3 > 1L)
  }
}
