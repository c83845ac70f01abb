package graft.queries

import graft.{ArtifactStore, SparkSpec}
import org.apache.spark.sql.functions.{col, concat, count, countDistinct, length, lit, min}

/** Independent (non-DuckDB) evidence for the round-3/4 analytics surface
  * q88–q94: brute-force Scala re-computations and algebraic invariants,
  * so correctness doesn't rest on the oracle alone (the oracle mirrors
  * the same SQL algorithm; these do not).
  */
class AnalyticsSpec extends SparkSpec {

  private def docsTokens: Seq[(Long, Vector[String])] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toVector)
      .toSeq

  /** The engine-wide 60-bit md5 idiom, recomputed independently. */
  private def h60(tag: String, v: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((tag + "|" + v).getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("q88: covered/n_dup_grams equal a brute-force interval union per doc") {
    val res = graft.SparkEntry.queries("q88_dup_spans")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val docs = docsTokens
    val gramDocs = scala.collection.mutable.Map
      .empty[Vector[String], scala.collection.mutable.Set[Long]]
    for ((id, w) <- docs; i <- 0 to w.length - 8)
      gramDocs.getOrElseUpdate(w.slice(i, i + 8),
        scala.collection.mutable.Set.empty) += id
    val dup = gramDocs.collect { case (g, ds) if ds.size >= 2 => g }.toSet
    assert(res.size == docs.size)
    for ((id, w) <- docs) {
      val starts = (0 to w.length - 8).filter(i => dup.contains(w.slice(i, i + 8)))
      var covered = 0L
      var end = -1
      for (i <- starts) {
        covered += math.max(0, i + 8 - math.max(i, end))
        end = math.max(end, i + 8)
      }
      val (nTok, nDupGrams, cov) = res(id)
      assert(nTok == w.length, s"doc $id n_tok")
      assert(nDupGrams == starts.size.toLong, s"doc $id n_dup_grams")
      assert(cov == covered, s"doc $id covered")
    }
  }

  test("q98: clean text equals a brute-force keep-first-occurrence excision") {
    val res = graft.SparkEntry.queries("q98_dup_span_remove")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val docs = docsTokens
    // corpus-order first occurrence per cross-doc-duplicated 8-gram
    val occs = scala.collection.mutable.Map
      .empty[Vector[String], scala.collection.mutable.ArrayBuffer[(Long, Int)]]
    for ((id, w) <- docs; i <- 0 to w.length - 8)
      occs.getOrElseUpdate(w.slice(i, i + 8),
        scala.collection.mutable.ArrayBuffer.empty) += ((id, i))
    val dup = occs.filter(_._2.map(_._1).distinct.size >= 2)
    assert(dup.nonEmpty, "corpus must contain cross-doc duplicated grams")
    assert(res.size == docs.size)
    val removed = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Int]]
    for ((_, os) <- dup) {
      val first = os.minBy { case (id, i) => (id, i) }
      for ((id, i) <- os if (id, i) != first;
           p <- i until i + 8)
        removed.getOrElseUpdate(id, scala.collection.mutable.Set.empty) += p
    }
    for ((id, w) <- docs) {
      val rm = removed.getOrElse(id, Set.empty[Int])
      val expect = w.zipWithIndex.collect { case (t, i) if !rm.contains(i) => t }
        .mkString(" ")
      val (nTok, nRemoved, clean) = res(id)
      assert(nTok == w.length, s"doc $id n_tok")
      assert(nRemoved == rm.size.toLong, s"doc $id n_removed")
      assert(clean == expect, s"doc $id clean_text")
    }
    assert(removed.nonEmpty, "excision must touch at least one document")
  }

  test("q89: KMV sketch state matches an independent Scala recomputation") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_returnflag", "l_orderkey").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val byGrp = li.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val res = graft.SparkEntry.queries("q89_kmv_distinct")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4))))
      .toMap
    assert(res.keySet == byGrp.keySet)
    for ((grp, keys) <- byGrp) {
      val hashes = keys.map(k => h60("kmv", k.toString)).distinct.sorted
      val kmv = hashes.take(64)
      val (kUsed, kthHash, trueDistinct) = res(grp)
      assert(kUsed == kmv.size.toLong, s"$grp k_used")
      assert(kthHash == kmv.last, s"$grp kth_hash")
      assert(trueDistinct == keys.size.toLong, s"$grp true_distinct")
    }
  }

  test("q89: estimate is within 50% relative error at k=64") {
    val rel = graft.SparkEntry.queries("q89_kmv_distinct")(spark, sfDir)
      .select("rel_err").collect().map(_.getDouble(0))
    assert(rel.nonEmpty && rel.forall(e => math.abs(e) < 0.5), rel.toSeq)
  }

  test("q91: rank mass positive, descending, well-formed, deterministic") {
    val run1 = graft.SparkEntry.queries("q91_pagerank")(spark, sfDir).collect()
    val run2 = graft.SparkEntry.queries("q91_pagerank")(spark, sfDir).collect()
    assert(run1.length == 20)
    val nodes = run1.map(_.getString(0))
    assert(nodes.distinct.length == 20)
    assert(nodes.forall(_.matches("[sp]\\d+")), nodes.toSeq)
    val prs = run1.map(_.getLong(2))
    assert(prs.forall(_ > 0L))
    assert(prs.sameElements(prs.sorted.reverse), "pr must be descending")
    // integer fixpoint => bit-identical across executions
    assert(run1.map(_.toString).sameElements(run2.map(_.toString)))
  }

  test("q91 graph store: edges/degrees serve from the lineitem-keyed " +
    "artifact, equal the from-scratch build, and rebuild nothing on reuse") {
    val (edges, deg) = AnalyticsQueries.prGraph(spark, sfDir)
    def eSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"),
        r.getAs[Long]("deg_src"), r.getAs[Long]("deg_dst"))).toSet
    val direct = eSet(AnalyticsQueries.prGraphDirect(spark, sfDir))
    assert(eSet(edges) == direct,
      "the served edge list must equal the from-scratch distinct-pair build")
    val degDirect = direct.groupBy(_._1)
      .map { case (srcN, es) => srcN -> es.size.toLong }
    assert(deg.collect().map(r =>
      r.getAs[Long]("node") -> r.getAs[Long]("deg")).toMap == degDirect,
      "the served degree table must equal a degree count over the edges")
    assert(direct.forall { case (srcN, dstN, ds, dd) =>
      degDirect(srcN) == ds && degDirect(dstN) == dd },
      "edge-carried degrees must equal the true endpoint degrees")
    // generation reuse: a second derivation runs NO build thunk and the
    // served plan is a FileScan of the store (no lineitem scan, no
    // distinct-pair shuffle anywhere in the fixpoint's input)
    val builds = ArtifactStore.buildCount.getOrDefault("pr_edges_v2", 0)
    val (edges2, _) = AnalyticsQueries.prGraph(spark, sfDir)
    assert(ArtifactStore.buildCount.getOrDefault("pr_edges_v2", 0) == builds,
      "a same-corpus rerun must serve the published graph, not rebuild")
    val plan = edges2.queryExecution.executedPlan.toString
    assert(plan.contains("pr_edges_v2") && !plan.contains("lineitem"),
      s"the served edges must FileScan the store, not the corpus:\n$plan")
  }

  test("q92: n_bigrams matches token count; avg_p is a probability") {
    val res = graft.SparkEntry.queries("q92_lm_quality")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val docs = docsTokens
    assert(res.size == docs.size)
    for ((id, w) <- docs) {
      val (nBigrams, avgP) = res(id)
      assert(nBigrams == math.max(0, w.length - 1).toLong, s"doc $id n_bigrams")
      if (nBigrams > 0) assert(avgP > 0.0 && avgP <= 1.0, s"doc $id avg_p=$avgP")
      else assert(avgP == 0.0)
    }
  }

  test("q93: sessions partition each user's events with >30min gaps between them") {
    val gapUs = 1800000000L
    val events = graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS tsu").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val perUser = events.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val res = graft.SparkEntry.queries("q93_sessionize")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // per user: session ids 1..k, n_events sums to the user's event count,
    // sessions ordered, non-overlapping, separated by more than the gap
    for ((user, rows) <- res.groupBy(_._1)) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to sorted.length.toLong),
        s"user $user session ids")
      assert(sorted.map(_._3).sum == perUser(user).length.toLong,
        s"user $user event count")
      for (Array(a, b) <- sorted.sliding(2).map(_.toArray)) {
        assert(a._5 <= b._4, s"user $user sessions overlap")
        assert(b._4 - a._5 > gapUs, s"user $user gap rule violated")
      }
      for ((_, _, _, start, end) <- sorted) assert(start <= end)
    }
    assert(res.map(_._1).toSet == perUser.keySet)
  }

  test("q104: every quantile equals the brute-force sorted order statistic") {
    val res = graft.SparkEntry.queries("q104_exact_quantiles")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toSeq
    val groups = ev.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) } +
      ("ALL" -> ev.map(_._2))
    val targets = Seq("p50" -> 50, "p90" -> 90, "p99" -> 99)
    assert(res.size == groups.size * targets.size)
    for ((g, vs) <- groups; (ql, qp) <- targets) {
      val sorted = vs.sorted
      val r = (qp.toLong * sorted.length + 99) / 100
      val (n, v) = res((g, ql))
      assert(n == sorted.length.toLong, s"($g,$ql) n")
      assert(v == sorted((r - 1).toInt), s"($g,$ql) value")
    }
  }

  test("q109: overlap estimate matches an independent KMV recomputation") {
    val res = graft.SparkEntry.queries("q109_kmv_overlap")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7)))).toMap
    assert(res.nonEmpty)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_type", "user_id").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val byGrp = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val k = 64
    val sketch = byGrp.view.mapValues(
      _.map(u => h60("kmvov", u.toString)).toSeq.sorted.take(k)).toMap
    val grps = byGrp.keys.toSeq.sorted
    for (ga <- grps; gb <- grps if ga < gb) {
      val (kUsed, both, estU, estI, truth, relErr) = res((ga, gb))
      val union = (sketch(ga) ++ sketch(gb)).distinct.sorted.take(k)
      val bothSet = sketch(ga).toSet & sketch(gb).toSet
      val myBoth = union.count(bothSet.contains).toLong
      assert(kUsed == union.size.toLong, s"($ga,$gb) k_used")
      assert(both == myBoth, s"($ga,$gb) both_cnt")
      val myEstU = if (union.size < k) union.size.toDouble
        else (k - 1).toDouble / (union.last.toDouble / math.pow(2, 60))
      assert(estU == myEstU, s"($ga,$gb) est_union")
      assert(truth == (byGrp(ga) & byGrp(gb)).size.toLong, s"($ga,$gb) truth")
      // when the union fits in k the sketch IS the data: exact answer
      if (kUsed < k) {
        assert(estI == both.toDouble && both == truth && relErr == 0.0,
          s"($ga,$gb) must degenerate to exact")
      }
      assert(both <= kUsed)
    }
  }

  test("q112: triangle census equals a brute recomputation") {
    val r = graft.SparkEntry.queries("q112_triangles")(spark, sfDir).head()
    val docs = docsTokens
    val cap = math.max(5L, math.ceil(0.01 * docs.size).toLong)
    val gramDocs = scala.collection.mutable.Map
      .empty[Vector[String], scala.collection.mutable.Set[Long]]
    for ((id, w) <- docs; i <- 0 to w.length - 8)
      gramDocs.getOrElseUpdate(w.slice(i, i + 8),
        scala.collection.mutable.Set.empty) += id
    val edges = scala.collection.mutable.Set.empty[(Long, Long)]
    for ((_, ds) <- gramDocs if ds.size >= 2 && ds.size <= cap;
         a <- ds; b <- ds if a < b) edges += ((a, b))
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    // deg.keys is a Set — materialize to a Seq so the inner generator
    // does not collapse the per-edge `yield 1`s into a single element
    // (one edge can close several triangles via distinct third vertices)
    val tris = (for ((a, b) <- edges.iterator; c <- deg.keys.toSeq
                     if b < c && edges(b -> c) && edges(a -> c)) yield 1).size
    assert(r.getLong(0) == deg.size.toLong, "n_nodes")
    assert(r.getLong(1) == edges.size.toLong, "n_edges")
    assert(r.getLong(2) == wedges, "n_wedges")
    assert(r.getLong(3) == tris.toLong, "n_triangles")
    assert(r.getLong(3) > 0, "sf0.001 must have a triangle witness")
    val cc = r.getDouble(4)
    assert(cc >= 0.0 && cc <= 1.0 && cc == 3.0 * tris / wedges)
  }

  test("span-gram stores: occurrences and per-gram stats equal the " +
    "from-scratch derivations; an append re-explodes only the delta") {
    def oSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos"),
        r.getAs[Long]("g"))).toSet
    def sSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("g"), r.getAs[Long]("nd"),
        r.getAs[Long]("fk"))).toSet
    assert(oSet(AnalyticsQueries.gramOcc(spark, sfDir)) ==
      oSet(AnalyticsQueries.gramOccDirect(spark, sfDir)),
      "the served occurrences must equal the inline explode+hash")
    val expStats = AnalyticsQueries.gramOccDirect(spark, sfDir)
      .groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("nd"),
        min(col("doc_id") * lit(1L << 21) + col("pos")).as("fk"))
      .where(col("nd") >= 2)
    assert(sSet(AnalyticsQueries.gramStats(spark, sfDir)) == sSet(expStats),
      "the served gram stats must equal the inline dup-gram aggregation")

    // delta leg: a salted two-version corpus — the append must carry
    // the prior docs' occurrence rows and explode ONLY the new docs
    val tmp = java.nio.file.Files.createTempDirectory("gram_occ").toString
    val salt = s"gsalt ${java.util.UUID.randomUUID.toString.take(8)} "
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), concat(lit(salt), col("text")).as("text"),
        col("lang"), col("source"),
        length(concat(lit(salt), col("text"))).cast("long").as("n_chars"))
    val docsA = base.where(col("doc_id") < 150)
    docsA.coalesce(1).write.parquet(s"$tmp/a/documents.parquet")
    assert(oSet(AnalyticsQueries.gramOcc(spark, s"$tmp/a")) ==
      oSet(AnalyticsQueries.gramOccDirect(spark, s"$tmp/a")))
    val docsB = docsA.unionByName(
      base.where(col("doc_id") >= 150 && col("doc_id") < 200))
    docsB.coalesce(1).write.parquet(s"$tmp/b/documents.parquet")
    assert(oSet(AnalyticsQueries.gramOcc(spark, s"$tmp/b")) ==
      oSet(AnalyticsQueries.gramOccDirect(spark, s"$tmp/b")),
      "the delta-built occurrence store must equal a from-scratch build")
    assert(ArtifactStore.deltaStats.get("gram_occ8_v1") == ((150L, 50L)),
      s"append must carry 150 docs' rows and re-explode only the 50 " +
        s"new: ${ArtifactStore.deltaStats.get("gram_occ8_v1")}")
  }

  test("lpa label store: labels serve from the corpus-keyed artifact, " +
    "equal the from-scratch fixpoint, and rebuild nothing on reuse") {
    def lSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("label"))).toSet
    val served = AnalyticsQueries.lpaLabelsServed(spark, sfDir)
    assert(lSet(served) == lSet(AnalyticsQueries.lpaLabelsDirect(spark, sfDir)),
      "the served labels must equal the 5-round fixpoint run inline")
    // generation reuse: a second derivation (q126's read of the same
    // store within one suite pass) runs NO build thunk and FileScans
    // the store — no LPA joins, no dup_edges input in the plan
    val builds = ArtifactStore.buildCount.getOrDefault("lpa_labels_v1", 0)
    val again = AnalyticsQueries.lpaLabelsServed(spark, sfDir)
    assert(ArtifactStore.buildCount.getOrDefault("lpa_labels_v1", 0) == builds,
      "a same-corpus rerun must serve the published labels, not rebuild")
    val plan = again.queryExecution.executedPlan.toString
    assert(plan.contains("lpa_labels_v1") && !plan.contains("dup_edges_v1"),
      s"the served labels must FileScan the store, not re-run the fixpoint:\n$plan")
  }

  test("kcore/bfs stores: served state equals the from-scratch fixpoints " +
    "and rebuilds nothing on reuse") {
    def kSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("deg_core"))).toSet
    def bSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("hop"))).toSet
    assert(kSet(AnalyticsQueries.kcoreServed(spark, sfDir)) ==
      kSet(AnalyticsQueries.kcoreDirect(spark, sfDir)),
      "served 2-core must equal the inline peel")
    assert(bSet(AnalyticsQueries.bfsHopsServed(spark, sfDir)) ==
      bSet(AnalyticsQueries.bfsHopsDirect(spark, sfDir)),
      "served hop map must equal the inline traversal")
    for (key <- Seq("kcore_deg_v1", "bfs_hops_v1")) {
      val builds = ArtifactStore.buildCount.getOrDefault(key, 0)
      val again = if (key == "kcore_deg_v1")
        AnalyticsQueries.kcoreServed(spark, sfDir)
      else AnalyticsQueries.bfsHopsServed(spark, sfDir)
      assert(ArtifactStore.buildCount.getOrDefault(key, 0) == builds,
        s"a same-corpus rerun of $key must serve, not rebuild")
      val plan = again.queryExecution.executedPlan.toString
      assert(plan.contains(key) && !plan.contains("dup_edges_v1"),
        s"$key must FileScan the store, not re-run the fixpoint:\n$plan")
    }
  }

  test("q125: community sizes equal a brute synchronous-LPA simulation") {
    val res = AnalyticsQueries.labelPropagation(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute edge set: q112's construction (same graph by definition)
    val docs = docsTokens
    val cap = math.max(5L, math.ceil(0.01 * docs.size).toLong)
    val gramDocs = scala.collection.mutable.Map
      .empty[Vector[String], scala.collection.mutable.Set[Long]]
    for ((id, w) <- docs; i <- 0 to w.length - 8)
      gramDocs.getOrElseUpdate(w.slice(i, i + 8),
        scala.collection.mutable.Set.empty) += id
    val edges = scala.collection.mutable.Set.empty[(Long, Long)]
    for ((_, ds) <- gramDocs if ds.size >= 2 && ds.size <= cap;
         a <- ds; b <- ds if a < b) edges += ((a, b))
    val nbrs = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // 5 synchronous rounds: mode of neighbor labels, ties -> smallest
    var labels: Map[Long, Long] = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 5) {
      labels = nbrs.map { case (n, ns) =>
        val counts = ns.map(labels).groupBy(identity).view
          .mapValues(_.size.toLong).toMap
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val brute = labels.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    assert(res == brute, s"communities differ:\n$res\n$brute")
    // witness: at least one multi-node community formed
    assert(res.values.max >= 2, "no community larger than a single node")
    assert(res.values.sum == nbrs.size.toLong, "every node must be labeled")
  }

  test("q126: modularity contributions equal a brute recomputation; Q improves on random") {
    val res = AnalyticsQueries.modularityAudit(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // brute: q125's exact label simulation, then integer modularity
    val docs = docsTokens
    val cap = math.max(5L, math.ceil(0.01 * docs.size).toLong)
    val gramDocs = scala.collection.mutable.Map
      .empty[Vector[String], scala.collection.mutable.Set[Long]]
    for ((id, w) <- docs; i <- 0 to w.length - 8)
      gramDocs.getOrElseUpdate(w.slice(i, i + 8),
        scala.collection.mutable.Set.empty) += id
    val edges = scala.collection.mutable.Set.empty[(Long, Long)]
    for ((_, ds) <- gramDocs if ds.size >= 2 && ds.size <= cap;
         a <- ds; b <- ds if a < b) edges += ((a, b))
    val nbrs = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels: Map[Long, Long] = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 5) {
      labels = nbrs.map { case (n, ns) =>
        val counts = ns.map(labels).groupBy(identity).view
          .mapValues(_.size.toLong).toMap
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val m = edges.size.toLong
    val eIn = edges.toSeq.filter(e => labels(e._1) == labels(e._2))
      .groupBy(e => labels(e._1)).view.mapValues(_.size.toLong).toMap
    val dSum = nbrs.map { case (n, ns) => n -> ns.size.toLong }
      .groupBy { case (n, _) => labels(n) }.view
      .mapValues(_.values.sum).toMap
    val sizes = labels.values.groupBy(identity).view.mapValues(_.size.toLong)
    assert(res.keySet == sizes.keys.toSet)
    sizes.foreach { case (c, sz) =>
      val expect = (sz, eIn.getOrElse(c, 0L), dSum(c), m,
        4L * m * eIn.getOrElse(c, 0L) - dSum(c) * dSum(c))
      assert(res(c) == expect, s"community $c: ${res(c)} vs brute $expect")
    }
    // a sane dense-community partition must beat random edge placement
    assert(res.values.map(_._5).sum > 0L, "total modularity numerator <= 0")
  }

  test("q128: assortativity statistics equal a brute recomputation; |r| <= 1") {
    val r = AnalyticsQueries.assortativity(spark, sfDir).head()
    val docs = docsTokens
    val cap = math.max(5L, math.ceil(0.01 * docs.size).toLong)
    val gramDocs = scala.collection.mutable.Map
      .empty[Vector[String], scala.collection.mutable.Set[Long]]
    for ((id, w) <- docs; i <- 0 to w.length - 8)
      gramDocs.getOrElseUpdate(w.slice(i, i + 8),
        scala.collection.mutable.Set.empty) += id
    val edges = scala.collection.mutable.Set.empty[(Long, Long)]
    for ((_, ds) <- gramDocs if ds.size >= 2 && ds.size <= cap;
         a <- ds; b <- ds if a < b) edges += ((a, b))
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val jk = edges.toSeq.map(e => (deg(e._1), deg(e._2)))
    val m = BigInt(jk.length)
    val a = jk.map { case (j, k) => BigInt(j) * k }.sum
    val b = jk.map { case (j, k) => BigInt(j) + k }.sum
    val c = jk.map { case (j, k) => BigInt(j) * j + BigInt(k) * k }.sum
    val expect = (m.toLong, a.toLong, b.toLong, c.toLong,
      (4 * m * a - b * b).toLong, (2 * m * c - b * b).toLong)
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))
    assert(got == expect, s"got $got, brute $expect")
    // Pearson bound: |r_num| <= r_den (r_den >= 0 unless degenerate)
    assert(got._6 > 0L && math.abs(got._5) <= got._6,
      "assortativity must be a valid correlation")
  }

  test("q108: OHLC equals a brute per-bucket recomputation") {
    val res = graft.SparkEntry.queries("q108_resample_ohlc")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type", s"$tsMicros AS tsu", "event_id", "value").collect()
      .map { r =>
        val us = r.getLong(1)
        val hour = Math.floorDiv(us, 3600000000L) * 3600L
        (r.getString(0), fmt.format(java.time.Instant.ofEpochSecond(hour)),
          us, r.getLong(2), r.getDouble(3))
      }
    val brute = ev.groupBy(e => (e._1, e._2)).map { case (k, es) =>
      val sorted = es.sortBy(e => (e._3, e._4))
      k -> ((es.length.toLong, sorted.head._5, es.map(_._5).max,
        es.map(_._5).min, sorted.last._5))
    }
    assert(res.keySet == brute.keySet)
    for ((k, (n, o, hi, lo, c)) <- brute) {
      val (rn, ro, rhi, rlo, rc) = res(k)
      assert(rn == n && ro == o && rhi == hi && rlo == lo && rc == c, s"$k")
    }
  }

  test("q119: trend statistics equal an exact BigInt brute per group") {
    val res = AnalyticsQueries.groupTrend(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type", s"$tsMicros div 3600000000 AS h",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val hmin = ev.map(_._2).min
    val byG = ev.groupBy(_._1)
    assert(res.keySet == byG.keySet)
    byG.foreach { case (g, rows) =>
      val xs = rows.map(t => BigInt(t._2 - hmin))
      val ys = rows.map(t => BigInt(t._3))
      val n = BigInt(rows.length)
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val expect = (rows.length.toLong, sx.toLong, sy.toLong,
        (n * sxy - sx * sy).toLong, (n * sxx - sx * sx).toLong)
      assert(res(g) == expect, s"$g: got ${res(g)}, brute $expect")
      // den = n²·Var(x) — must be strictly positive with a real time span
      assert(res(g)._5 > 0, s"$g: degenerate time span")
    }
  }

  test("q124: transition counts equal a brute per-user sequence walk") {
    val res = AnalyticsQueries.eventTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("user_id", s"$tsMicros AS tsn", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val brute = ev.groupBy(_._1).values.flatMap { rows =>
      val seq = rows.sortBy(t => (t._2, t._3)).map(_._4)
      seq.zip(seq.tail)
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTotals = brute.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    assert(res.keySet == brute.keySet, "transition pair coverage differs")
    res.foreach { case (pair, (n, tot)) =>
      assert(n == brute(pair), s"$pair: $n vs brute ${brute(pair)}")
      assert(tot == fromTotals(pair._1), s"$pair from_total wrong")
    }
    // a Markov row must sum to its own total
    res.groupBy(_._1._1).foreach { case (p, rows) =>
      assert(rows.values.map(_._1).sum == rows.values.head._2,
        s"row $p does not sum to from_total")
    }
  }

  test("q94: IVF-arm fused top-10 overlaps >= 0.8 with the exact-arm top-10") {
    val exact = graft.SparkEntry.queries("q90_rrf_hybrid")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ivf = graft.SparkEntry.queries("q94_rrf_hybrid_ivf")(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.size == 10 && ivf.size == 10)
    val overlap = (exact & ivf).size / 10.0
    assert(overlap >= 0.8, s"fused overlap $overlap (exact=$exact ivf=$ivf)")
  }

  test("q133: serial-correlation statistics equal an exact BigInt brute per group") {
    val rows = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type", s"$tsMicros AS tsn", "event_id",
        "CAST(value AS DECIMAL(18,2)) AS v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDecimal(3).movePointRight(2).longValueExact()))
    val exp = rows.groupBy(_._1).view.mapValues { es =>
      val ys = es.sortBy(e => (e._2, e._3)).map(e => BigInt(e._4))
      val (xs, ny) = (ys.dropRight(1), ys.drop(1))
      val n = BigInt(xs.size)
      val sx = xs.sum; val sy = ny.sum
      val sxy = xs.zip(ny).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum; val syy = ny.map(a => a * a).sum
      (n, n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
    }.toMap
    val got = AnalyticsQueries.autocorr(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((BigInt(r.getLong(1)), BigInt(r.getLong(2)),
        BigInt(r.getLong(3)), BigInt(r.getLong(4))))).toMap
    assert(got == exp, "autocorr sufficient statistics differ from brute")
    // |r1| <= 1 (Cauchy-Schwarz on the exact integers)
    exp.foreach { case (g, (_, num, dx, dy)) =>
      assert(num * num <= dx * dy, s"$g: |r1| > 1 — impossible")
    }
  }

  /** events as (grp, tu micros, cents), plus the drift-pair midpoint
    * split — the brute mirror of halvedValues. */
  private def halvedBrute: Seq[(String, Long, Long)] = {
    val rows = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type", s"$tsMicros AS tu",
        "CAST(value AS DECIMAL(18,2)) AS v").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).movePointRight(2).longValueExact()))
    val tmn = rows.map(_._2).min; val tmx = rows.map(_._2).max
    val mid = tmn + (tmx - tmn) / 2
    rows.map { case (g, tu, v) => (g, if (tu < mid) 0L else 1L, v) }
  }

  test("q136: PSI bin counts equal a brute bucketize; all 10 bins reported") {
    val rows = halvedBrute
    val vmn = rows.map(_._3).min; val vmx = rows.map(_._3).max
    def bin(v: Long) = (v - vmn) * 10 / (vmx - vmn + 1)
    val exp = rows.groupBy(r => (r._1, bin(r._3))).view.mapValues { rs =>
      (rs.count(_._2 == 0L).toLong, rs.count(_._2 == 1L).toLong)
    }.toMap
    val tot = rows.groupBy(_._1).view.mapValues(rs =>
      (rs.count(_._2 == 0L).toLong, rs.count(_._2 == 1L).toLong)).toMap
    val got = AnalyticsQueries.psiDrift(spark, sfDir).collect()
    val grps = rows.map(_._1).distinct
    assert(got.length == grps.size * 10, "dense 10-bin frame per group")
    got.foreach { r =>
      val (g, b) = (r.getString(0), r.getLong(1))
      val (ea, eb) = exp.getOrElse((g, b), (0L, 0L))
      assert((r.getLong(2), r.getLong(3)) == ((ea, eb)), s"($g,$b) counts")
      assert((r.getLong(4), r.getLong(5)) == tot(g), s"($g) totals")
    }
  }

  test("q137: KS numerator equals a brute max over the merged value grid") {
    val rows = halvedBrute
    val exp = rows.groupBy(_._1).view.mapValues { rs =>
      val a = rs.filter(_._2 == 0L).map(_._3).sorted
      val b = rs.filter(_._2 == 1L).map(_._3).sorted
      val na = a.size.toLong; val nb = b.size.toLong
      val grid = (a ++ b).distinct.sorted
      val d = grid.map { v =>
        val ca = a.count(_ <= v).toLong; val cb = b.count(_ <= v).toLong
        math.abs(ca * nb - cb * na)
      }.max
      (na, nb, d)
    }.toMap
    val got = AnalyticsQueries.ksDrift(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == exp, "KS statistics differ from brute")
    // D/(na*nb) is a probability distance: numerator bounded by na*nb
    exp.foreach { case (g, (na, nb, d)) =>
      assert(d <= na * nb, s"$g: D > 1 — impossible")
      assert(d > 0, s"$g: identical halves are vanishingly unlikely here")
    }
  }

  test("q132: fixed-round peel equals the true 2-core fixpoint; pendants peel") {
    // independent edge derivation (q112's brute) + peel-to-fixpoint
    val docs = docsTokens
    val cap = math.max(5L, math.ceil(0.01 * docs.size).toLong)
    val gramDocs = scala.collection.mutable.Map
      .empty[Vector[String], scala.collection.mutable.Set[Long]]
    for ((id, w) <- docs; i <- 0 to w.length - 8)
      gramDocs.getOrElseUpdate(w.slice(i, i + 8),
        scala.collection.mutable.Set.empty) += id
    var edges = (for ((_, ds) <- gramDocs.toSeq if ds.size >= 2 && ds.size <= cap;
                      a <- ds; b <- ds if a < b) yield (a, b)).toSet
    val allNodes = edges.flatMap(e => Set(e._1, e._2))
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 2).keySet
      val next = edges.filter(e => keep(e._1) && keep(e._2))
      changed = next != edges
      edges = next
    }
    val expected = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = AnalyticsQueries.kcore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      "6-round peel differs from the 2-core fixpoint on this graph")
    assert(got.nonEmpty, "sf0.001 must retain a 2-core witness")
    assert(got.keySet.size < allNodes.size,
      "sf0.001 must peel at least one pendant node (witness)")
  }

  test("q152: sketch equals a brute hash-sample; rank error is bounded") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type", "event_id",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .collect()
      .flatMap(r => Seq(r.getString(0), "ALL")
        .map(g => (g, r.getLong(1), r.getLong(2))))
    val k = 64
    val targets = Seq(("p50", 50), ("p90", 90), ("p99", 99))
    val exp = ev.groupBy(_._1).flatMap { case (g, rows) =>
      val n = rows.length.toLong
      val smp = rows.map(t => (h60("qs", t._2.toString), t._3))
        .sortBy(t => (t._1, t._2)).take(k).map(_._2).sorted
      val m = smp.length.toLong
      targets.map { case (ql, qp) =>
        (g, ql) -> ((n, m, smp(((qp * m + 99) / 100 - 1).toInt)))
      }
    }.toMap
    val got = AnalyticsQueries.quantileSketch(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == exp, "sketch differs from brute hash-sample")
    // calibration against the exact answer: the estimate's true rank
    // must sit near the target percentile (4σ ≈ 4·√(p(1-p)/k) < 0.25)
    ev.groupBy(_._1).foreach { case (g, rows) =>
      val sorted = rows.map(_._3).sorted
      targets.foreach { case (ql, qp) =>
        val est = got((g, ql))._3
        val rank = sorted.count(_ <= est).toDouble / sorted.length
        assert(math.abs(rank - qp / 100.0) <= 0.25,
          s"($g,$ql) rank error ${math.abs(rank - qp / 100.0)}")
      }
    }
  }

  test("q156: contamination matrix equals a brute edge roll-up") {
    val docs = docsTokens
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cap = math.max(5L, math.ceil(0.01 * docs.size).toLong)
    val gramDocs = scala.collection.mutable.Map
      .empty[Vector[String], scala.collection.mutable.Set[Long]]
    for ((id, w) <- docs; i <- 0 to w.length - 8)
      gramDocs.getOrElseUpdate(w.slice(i, i + 8),
        scala.collection.mutable.Set.empty) += id
    val edges = (for ((_, ds) <- gramDocs.toSeq if ds.size >= 2 && ds.size <= cap;
                      a <- ds; b <- ds if a < b) yield (a, b)).toSet
    val cells = edges.toSeq.map { case (x, y) =>
      val (sx, sy) = (src(x), src(y))
      if (sx <= sy) ((sx, sy), x, y) else ((sy, sx), y, x)
    }
    val exp = cells.groupBy(_._1).view.mapValues { es =>
      (es.size.toLong, es.map(_._2).distinct.size.toLong,
        es.map(_._3).distinct.size.toLong)
    }.toMap
    val got = AnalyticsQueries.sourceDupMatrix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == exp, "matrix differs from brute roll-up")
    assert(got.nonEmpty, "sf0.001 must surface at least one dup cell")
    assert(got.keys.exists { case (a, b) => a != b },
      "sf0.001 must surface cross-source contamination (witness)")
  }

  test("q149: hop map equals a brute 4-round multi-source BFS") {
    val docs = docsTokens
    val cap = math.max(5L, math.ceil(0.01 * docs.size).toLong)
    val gramDocs = scala.collection.mutable.Map
      .empty[Vector[String], scala.collection.mutable.Set[Long]]
    for ((id, w) <- docs; i <- 0 to w.length - 8)
      gramDocs.getOrElseUpdate(w.slice(i, i + 8),
        scala.collection.mutable.Set.empty) += id
    val edges = (for ((_, ds) <- gramDocs.toSeq if ds.size >= 2 && ds.size <= cap;
                      a <- ds; b <- ds if a < b) yield (a, b)).toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val seeds = docs.map(_._1).filter(id => h60("takedown", id.toString) % 16 == 0)
    val dist = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
    for (hop <- 1L to 4L) {
      val frontier = dist.collect { case (n, h) if h == hop - 1 => n }.toSeq
      for (n <- frontier; m <- adj.getOrElse(n, Set.empty)
           if !dist.contains(m)) dist(m) = hop
    }
    val got = AnalyticsQueries.bfsHops(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist.toMap, "BFS hop map differs from brute traversal")
    assert(got.valuesIterator.contains(0L), "seeds must appear at hop 0")
    assert(got.valuesIterator.exists(_ > 0L),
      "sf0.001 must reach at least one non-seed doc (witness)")
  }
}
