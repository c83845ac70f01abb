package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.col

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

  test("q78 PII counts match the injection cadence and the scrub is shuffle-free") {
    val df = CurationQueries.piiScrub(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (if (id % 3 == 0) 1L else 0L), s"doc $id emails")
      assert(r.getLong(2) == (if (id % 5 == 0) 1L else 0L), s"doc $id phones")
      assert(r.getLong(3) == (if (id % 7 == 0) 1L else 0L), s"doc $id ips")
      assert(r.getBoolean(4) == (id % 3 == 0 || id % 5 == 0 || id % 7 == 0))
    }
    // row-local operator: nothing to exchange except the final presentation sort
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning"),
      "the scrub itself must not introduce a hash shuffle")
  }

  test("q79 packs partition each source's token stream without loss") {
    val docs = graft.Tables.documents(spark, sfDir)
      .selectExpr("source", "size(split(trim(text), '\\\\s+')) as n")
      .groupBy("source").sum("n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val packs = CurationQueries.sequencePack(spark, sfDir).collect()
    val bySource = packs.groupBy(_.getString(0))
    assert(bySource.keySet == docs.keySet)
    bySource.foreach { case (src, ps) =>
      // no tokens lost: pack totals reassemble the source shard exactly
      assert(ps.map(_.getLong(3)).sum == docs(src), s"$src token sum")
      // pack ids are the contiguous chunk sequence 0..k-1
      assert(ps.map(_.getLong(1)).sorted.sameElements(0L until ps.length), src)
      // packs cover disjoint ascending doc_id ranges
      val ordered = ps.sortBy(_.getLong(1))
      ordered.foreach(p => assert(p.getLong(4) <= p.getLong(5)))
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) < b.getLong(4), src)
        case _ =>
      }
      // every pack but the last starts inside the budget it was cut at
      ordered.dropRight(1).zipWithIndex.foreach { case (p, i) =>
        assert(p.getLong(3) >= 1L, s"$src pack $i empty")
      }
    }
    // the packing window must be partitioned by source, never global
    val windows = CurationQueries.sequencePack(spark, sfDir)
      .queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec
      }
    assert(windows.nonEmpty && windows.forall(_.nonEmpty))
  }

  test("q80 keeps a budget-respecting prefix of each source") {
    val kept = CurationQueries.mixtureCap(spark, sfDir).collect()
    assert(kept.nonEmpty)
    kept.foreach(r => assert(r.getLong(3) <= r.getLong(4),
      s"doc ${r.getLong(0)} exceeds budget"))
    // prefix property: the kept docs of each source are exactly the
    // lowest doc_ids of that source (nothing later sneaks in)
    val allDocs = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "source").collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).sorted).toMap
    kept.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val ids = rs.map(_.getLong(0)).sorted
      assert(ids.sameElements(allDocs(src).take(ids.length)), s"$src not a prefix")
    }
    // tiered budgets both bind and don't bind somewhere on this corpus
    assert(kept.exists(_.getLong(4) == 400L) && kept.exists(_.getLong(4) == 2000L))
  }

  test("q82 Zipf curve covers the corpus monotonically and cuts via TakeOrdered") {
    val df = CurationQueries.zipfCurve(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 100)
    // ranks are 1..n with strictly non-increasing counts
    assert(rows.map(_.getLong(0)).sameElements(1L to rows.length))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) >= b.getLong(2))
      case _ =>
    }
    // cumulative share is monotone and, with the whole vocab inside the
    // top-100 cut on this corpus, ends at exactly 1.0
    val cum = rows.map(_.getDouble(4))
    cum.sliding(2).foreach {
      case Array(a, b) => assert(b >= a)
      case _ =>
    }
    assert(math.abs(cum.last - 1.0) < 1e-12,
      s"tiny vocab must be fully covered, got ${cum.last}")
    // the top-k cut must be a TakeOrdered/Limit, never a global vocab sort
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q83 keeps exactly k=5 deterministic docs per source") {
    val a = CurationQueries.groupSample(spark, sfDir).collect()
    val bySource = a.groupBy(_.getString(0))
    assert(bySource.size == 20)
    bySource.foreach { case (src, rs) =>
      assert(rs.length == 5, s"$src kept ${rs.length}")
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to 5L), src)
    }
    // sampled docs really belong to their source
    val owner = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    a.foreach(r => assert(owner(r.getLong(2)) == r.getString(0)))
    // re-running yields the identical sample (hash-determinism, no rand())
    val b = CurationQueries.groupSample(spark, sfDir).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
  }

  test("q85 shuffle-shard is a reproducible permutation with no global sort") {
    val df = CurationQueries.shuffleShard(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 500)
    // a true permutation: every doc appears exactly once
    assert(rows.map(_.getLong(2)).toSet.size == 500)
    val byShard = rows.groupBy(_.getLong(0))
    assert(byShard.keySet == (0L to 7L).toSet, "all 8 shards populated")
    byShard.foreach { case (sh, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length), s"shard $sh")
      // uniform hash: no shard degenerates (500/8 = 62.5 expected)
      assert(rs.length > 30 && rs.length < 100, s"shard $sh has ${rs.length}")
    }
    // determinism: identical on re-run
    assert(CurateMainOrder(df) == CurateMainOrder(
      CurationQueries.shuffleShard(spark, sfDir)))
    // scale posture: the ordering windows are shard-partitioned
    val windows = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec
    }
    assert(windows.nonEmpty && windows.forall(_.nonEmpty))
  }

  private def CurateMainOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q86 BM25 returns term-bearing docs in strictly ranked order") {
    val df = CurationQueries.bm25(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1))
    scores.sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "scores must be non-increasing")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 3, "n_terms in 1..3")
      assert(r.getDouble(1) > 0.0)
    }
    // every ranked doc really contains at least one query term
    val terms = Set("spark", "fast", "table")
    val ids = rows.map(_.getLong(0)).toSet
    val texts = graft.Tables.documents(spark, sfDir)
      .where(col("doc_id").isin(ids.toSeq: _*))
      .select("doc_id", "text").collect()
    texts.foreach { t =>
      val words = t.getString(1).split("\\s+").toSet
      assert(words.intersect(terms).nonEmpty, s"doc ${t.getLong(0)}")
    }
    // the cut is a TakeOrdered over broadcast-joined postings
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "df/avgdl stats must broadcast")
  }

  test("q81 boilerplate fractions are sane and the flag join is broadcast") {
    val df = CurationQueries.boilerplateGrams(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (n, b, f, keep) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))
      assert(b >= 0 && b <= n, s"doc ${r.getLong(0)} boiler count")
      assert(math.abs(f - b.toDouble / n) < 1e-12)
      assert(keep == (f <= 0.30))
    }
    // the threshold must actually flag something on this corpus
    assert(rows.exists(_.getLong(2) > 0), "no boilerplate flagged at all")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "the bounded flagged-gram set must come back as a broadcast")
  }

  test("q105 OOV aggregates equal a brute vocab recomputation; vocab join broadcasts") {
    val df = TextStatsQueries.vocabCoverage(spark, sfDir)
    val res = df.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getString(1), r.getString(2),
        r.getString(3).trim.split("\\s+").toSeq.filter(_.nonEmpty)))
      .filter(_._3.nonEmpty)
    val counts = docs.flatMap(_._3).groupBy(identity).map { case (t, xs) => t -> xs.size }
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(256).map(_._1).toSet
    val brute = docs.groupBy(d => (d._1, d._2)).map { case (k, ds) =>
      val oov = ds.map(_._3.count(!vocab.contains(_)).toLong)
      val tok = ds.map(_._3.length.toLong)
      k -> ((ds.size.toLong, tok.sum, oov.sum,
        tok.zip(oov).count { case (n, o) => o * 5 < n }.toLong))
    }
    assert(res == brute)
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "the frozen vocab must come back as a broadcast — token occurrences " +
        "must never shuffle for membership")
  }

  test("q103 chunks cover every token, overlap by W−S, and reconstruct the doc") {
    val rows = CurationQueries.chunkOverlap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(rows.nonEmpty)
    val multi = rows.groupBy(_._1).values.filter(_.length > 1)
    assert(multi.nonEmpty, "sf0.001 must produce at least one multi-chunk doc")
    rows.groupBy(_._1).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_._2)
      // chunk ids dense from 0; starts advance by the stride
      sorted.zipWithIndex.foreach { case ((_, cid, start, nTok, text), i) =>
        assert(cid == i && start == i * 32 + 1)
        assert(nTok == text.split(" ").length)
        assert(nTok <= 48 && nTok >= 1)
      }
      // coverage: last chunk reaches the last token exactly
      val (_, _, lastStart, lastN, _) = sorted.last
      val n = lastStart + lastN - 1
      assert(sorted.length == 1 + math.max(0L, (n - 48 + 31) / 32),
        s"doc $doc: ${sorted.length} chunks for $n tokens")
      // reconstruction: stitching non-overlapped chunk parts == doc tokens
      val stitched = sorted.flatMap { case (_, cid, _, _, text) =>
        val ws = text.split(" ")
        if (cid == 0) ws else ws.drop(48 - 32)
      }
      // only true when every non-final chunk is full-width
      if (sorted.init.forall(_._4 == 48))
        assert(stitched.length == n, s"doc $doc stitched ${stitched.length} vs $n")
    }
  }

  test("q114 verdicts equal a brute text-level recomputation of keep-first dedup") {
    val chunks = CurationQueries.chunkOverlap(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(4)))
    val verdicts = CurationQueries.chunkDedup(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(verdicts.keySet == chunks.map(_._1).toSet,
      "q114 must emit one verdict per q103 chunk")
    // brute: group by chunk TEXT (not hash) — also proves graft_h60 is
    // collision-free on this corpus, since hash-grouped counts match
    val byText = chunks.groupBy(_._2)
    byText.foreach { case (_, occ) =>
      val firstKey = occ.map(_._1).minBy { case (d, c) => d * (1L << 21) + c }
      occ.foreach { case (key, _) =>
        val (nOcc, keep) = verdicts(key)
        assert(nOcc == occ.length, s"$key n_occ $nOcc vs brute ${occ.length}")
        assert(keep == (key == firstKey), s"$key keep flag wrong")
      }
    }
    // witness: the corpus carries exact-duplicate docs (q24's subjects),
    // so duplicated chunks must exist and every one keeps exactly one copy
    val dups = byText.values.filter(_.length > 1)
    assert(dups.nonEmpty, "no duplicated chunk at test scale — vacuous dedup")
    assert(dups.forall(occ => occ.count(o => verdicts(o._1)._2) == 1))
  }

  test("q144 cascade legs tie out against brute flag recomputation") {
    def td(id: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"takedown|$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16) % 16 == 0
    }
    val got = CurationQueries.takedownCascade(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set("1_documents", "2_chunks", "3_packs",
      "4_pack_cohabitants", "5_dup_edges_severed"))
    got.values.foreach { case (aff, tot) =>
      assert(aff >= 0L && aff <= tot, s"affected $aff out of range of $tot") }
    // leg 1 against a brute hash pass over the raw table
    val ids = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    assert(got("1_documents") == ((ids.count(td).toLong, ids.length.toLong)))
    assert(got("1_documents")._1 > 0, "takedown set empty — vacuous cascade")
    // leg 2 against the tested chunker's own rows
    val ch = CurationQueries.chunkOverlap(spark, sfDir).collect()
      .map(_.getLong(0))
    assert(got("2_chunks") == ((ch.count(td).toLong, ch.length.toLong)))
    // leg 4's total is the surviving corpus: packing partitions the docs
    assert(got("4_pack_cohabitants")._2 == ids.length.toLong - got("1_documents")._1)
    // leg 5 endpoints come from q27's pair list
    val prs = DedupQueries.minhashNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got("5_dup_edges_severed") ==
      ((prs.count(p => td(p._1) != td(p._2)).toLong, prs.length.toLong)))
  }

  test("q146 allocation equals a brute Hamilton recomputation and sums to B") {
    val B = 100000L
    val bys = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).trim.split("\\s+").length.toLong)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val w = bys.view.mapValues(t => math.sqrt(t.toDouble).toLong).toMap
    val totalW = w.values.sum
    val af = w.view.mapValues(x => B * x / totalW).toMap
    val deficit = B - af.values.sum
    val bump = w.keys.toSeq
      .sortBy(s => (-(B * w(s) % totalW), s)).take(deficit.toInt).toSet
    val expect = bys.keys.map(s =>
      s -> ((bys(s), w(s), af(s) + (if (bump(s)) 1L else 0L)))).toMap
    val got = CurationQueries.mixtureAlloc(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
    assert(got.values.map(_._3).sum == B, "shares must sum to the budget exactly")
    // the flattening must actually bind: no source may hold a share more
    // than one bump away from its exact proportional entitlement
    got.foreach { case (s, (_, wt, alloc)) =>
      val lo = B * wt / totalW
      assert(alloc == lo || alloc == lo + 1, s"$s alloc $alloc vs floor $lo") }
  }

  test("q147 per-source affinity equals a brute hashed-bigram recomputation") {
    def h60(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perDoc = docs.map { case (id, src, text) =>
      val w = text.trim.split("\\s+")
      val fs = w.iterator.zip(w.iterator.drop(1))
        .map { case (a, b) => h60(s"dsir|$a $b") % 4096 }.toSeq
      (id, src, fs.groupBy(identity).view.mapValues(_.size.toLong).toMap)
    }.filter(_._3.nonEmpty)
    val cr = perDoc.flatMap(_._3).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val ct = perDoc.filter(_._2 == "src0").flatMap(_._3).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val (tr, tt) = (cr.values.sum, ct.values.sum)
    val expect = perDoc.groupBy(_._2).view.mapValues { ds =>
      val dots = ds.map { case (_, _, c) =>
        (c.map { case (f, n) => n * ct.getOrElse(f, 0L) }.sum,
          c.map { case (f, n) => n * cr(f) }.sum) }
      (ds.length.toLong,
        dots.count { case (dt, dr) =>
          BigInt(dt) * tr > BigInt(dr) * tt }.toLong,
        dots.map(_._1).sum, dots.map(_._2).sum)
    }.toMap
    val got = CurationQueries.dsirAffinity(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
    // the signal must detect the target: src0 has the highest affine rate
    val rates = got.view.mapValues(v => v._2.toDouble / v._1).toMap
    assert(rates("src0") == rates.values.max,
      s"target source must be most affine: $rates")
  }

  test("q153 index-served BM25 equals q86 bit-for-bit; serve path never scans the corpus") {
    def rows(name: String) =
      graft.SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => (r.getLong(0),
          java.lang.Double.doubleToLongBits(r.getDouble(1)), r.getLong(2)))
        .toSeq
    assert(rows("q153_bm25_indexed") == rows("q86_bm25"),
      "index-served scores must be bit-identical to the from-scratch arm")
    val df = CurationQueries.bm25Indexed(spark, sfDir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("documents.parquet"),
      "serve path must read the artifacts, not the corpus")
    assert(p.contains("postings_v1"), "artifact scan missing from plan")
    assert(p.contains("In(t, [fast,spark,table])") || p.contains("In(t"),
      s"query-term filter must push into the postings artifact scan")
  }
}
