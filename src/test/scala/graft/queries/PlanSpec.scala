package graft.queries

import graft.SparkSpec

/** Plan-shape regression guards for the scale posture: these assert the
  * properties `graft.Explain` is used to audit manually — pushdown
  * reaching the scans, column pruning, broadcast dimension joins, and
  * partial aggregation — so a refactor that silently trades them away
  * fails the suite, not just the benchmark.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q06 star join broadcasts all four dimension tables") {
    val p = plan("q06_join_star")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(800))
    assert(!p.contains("SortMergeJoin"), "star join must not shuffle the fact table")
  }

  test("q02 pushes range predicates into the parquet scan") {
    val p = plan("q02_filter_range")
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("LessThan(l_quantity"), p.take(800))
  }

  test("q06 prunes the lineitem scan to the three needed columns") {
    val p = plan("q06_join_star")
    val readSchemas = "ReadSchema: struct<[^>]*>".r.findAllIn(p).toList
    val lineitemRead = readSchemas.find(_.contains("l_orderkey"))
    assert(lineitemRead.isDefined)
    assert(!lineitemRead.get.contains("l_shipdate") &&
      !lineitemRead.get.contains("l_quantity"),
      s"lineitem scan reads more than needed: ${lineitemRead.get}")
  }

  test("q04 aggregates partially before the exchange (map-side combine)") {
    val p = plan("q04_agg_summary")
    val firstExchange = p.indexOf("Exchange")
    val hashAggsBefore = p.substring(firstExchange).contains("HashAggregate")
    assert(firstExchange >= 0 && hashAggsBefore, p.take(800))
  }

  test("q96 containment pairs meet only through the shingle-hash equi-join") {
    val p = plan("q96_containment")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "containment must never enumerate all document pairs")
    // the 8-byte join key is PRE-hashed: the plan must read the
    // hash-once artifact, not xxhash64 the corpus per query
    assert(p.contains("shingle_hashes8_v1"),
      "join key must be the 8-byte shingle hash from the hash-once artifact")
    assert(!p.contains("xxhash64"),
      "q96 must not re-hash a shingle at serve time")
  }

  test("q96 drops hot shingles (broadcast anti-join on df cap) before the self-join") {
    val df = graft.SparkEntry.queries("q96_containment")(spark, sfDir)
    val joins = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    // two anti-join instances: one per self-join side of the capped postings
    assert(joins.size >= 2,
      "both self-join sides must read df-capped postings via a broadcast anti-join " +
        "against the hot-shingle list; a shingle in d docs yields d² rows otherwise")
    val p = plan("q96_containment")
    assert("\\(df#\\d+L? > 5\\)".r.findFirstIn(p).isDefined,
      "the hot list must be built by a df > max(5, 1%·N) filter on the shingle-hash agg")
  }

  test("q104 never sorts or sort-merge-joins raw values; windows stay partitioned") {
    val df = graft.SparkEntry.queries("q104_exact_quantiles")(spark, sfDir)
    val p = plan("q104_exact_quantiles")
    assert(!p.contains("SortMergeJoin"),
      "stats/candidate joins must broadcast — raw values never sort-merge")
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "every window (histogram cumsum, within-bucket cumsum) must be partitioned; " +
        "an unpartitioned window would serialize the whole input on one task")
    // the exact order statistic must come from aggregated (value, count)
    // rows, not a per-row rank: no global Sort may precede the final
    // aggregate's exchange (the only full Sort allowed is the display
    // ORDER BY over <= groups x 3 result rows)
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "histogram and within-bucket passes must both partial-aggregate")
  }

  test("q108 OHLC is one aggregate: no window, no per-bucket sort") {
    val df = graft.SparkEntry.queries("q108_resample_ohlc")(spark, sfDir)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.isEmpty,
      "open/close must come from min_by/max_by aggregates — a row_number " +
        "window would sort every bucket's rows in one task")
    val p = plan("q108_resample_ohlc")
    assert(p.contains("min_by") && p.contains("max_by"), p.take(600))
  }

  test("q95 cohort sizes join is a broadcast, not a shuffle") {
    val p = plan("q95_cohort_retention")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q24 exact dedup groups by digest, not by document text") {
    val p = plan("q24_dedup_exact")
    assert(p.contains("md5"), p.take(400))
  }

  test("q58 global ntile is two-phase: every Window in the plan is partitioned") {
    val df = graft.SparkEntry.queries("q58_window_firstlast")(spark, sfDir)
    val windows = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec
    }
    assert(windows.nonEmpty, "expected window operators in q58's plan")
    assert(windows.forall(_.nonEmpty),
      "q58 must not contain an unpartitioned (single-task) window")
  }

  test("q63 range join is an equi-join on (user, bucket): no nested-loop anywhere") {
    val p = plan("q63_range_join_bucket")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
  }

  test("q61 as-of join uses only partitioned windows and no range join") {
    val df = graft.SparkEntry.queries("q61_asof_join")(spark, sfDir)
    val windows = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec
    }
    assert(windows.nonEmpty && windows.forall(_.nonEmpty),
      "as-of join must rank inside user partitions, never globally")
    val p = plan("q61_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
  }

  test("q62 stratified sample is row-local: no shuffle before the filter") {
    val df = graft.SparkEntry.queries("q62_stratified_sample")(spark, sfDir)
    val exchanges = df.queryExecution.sparkPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    // one Exchange allowed only for the final presentation ORDER BY
    assert(exchanges.size <= 1, df.queryExecution.sparkPlan.toString.take(1200))
  }

  test("q55/q64/q113 assignment is row-local: no per-vector window, no crossJoin") {
    // r7 verdict item 8: the old shape fanned every vector ×32 through
    // crossJoin(broadcast(cents)) + row_number over vec_id. With the
    // ServeBooks book folded into literal argmin/probe expressions, the
    // only windows left are the bounded per-QUERY ranking ones.
    for (q <- Seq("q55_knn_ivf", "q64_knn_ivfpq", "q113_knn_ivf_int8",
        "q164_knn_ivfpq_res", "q181_knn_filtered")) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val partNames = df.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          w.partitionSpec.flatMap(_.references.map(_.name))
      }
      assert(partNames.nonEmpty && partNames.forall(_.contains("query_id")),
        s"$q: every window must partition by query_id, got $partNames")
      assert(partNames.forall(!_.contains("vec_id")),
        s"$q: the ×32 per-vector assignment window is back: $partNames")
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    }
  }

  test("q164 codes read statically prunes to the probed cells' partitions") {
    // r14 verdict item 2: the cell-partitioned codes store must be read
    // through a STATIC partition filter on the probed cells (collected
    // driver-side from the bounded query set, filtered on the raw
    // partition column before the cast) — at corpus scale a probe set
    // reads its cells' directories, never the whole index
    import org.apache.spark.sql.functions._
    val df = graft.SparkEntry.queries("q164_knn_ivfpq_res")(spark, sfDir)
    val scans = df.queryExecution.sparkPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
        if sc.output.exists(_.name == "codes") => sc
    }
    assert(scans.nonEmpty, "q164 must read the codes store")
    assert(scans.head.partitionFilters.nonEmpty,
      "the probed-cells predicate must reach the codes scan as a " +
        "partition filter")
    // expected probe set, re-derived with the query's dials (50
    // queries, 8 probes — the q164 constants) from the RAW corpus
    // parquet — which since r16 is also the implementation's
    // definition (probedCellsFor derives from the unfiltered vecs so
    // the memoized set is a pure function of its (embeddingsFp,
    // bookDigest) key; tombstones can only make it a superset of the
    // served queries' probes, never change the q164 answer)
    val book = graft.llm.ServeBooks.coarse(spark, sfDir)
    val expected = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") < 50)
      .select(explode(graft.llm.ServeBooks.probeCells(book, 8,
        expr("transform(embedding, x -> CAST(x AS DOUBLE))"))).as("p"))
      .distinct().count()
    assert(scans.head.selectedPartitions.partitionCount == expected,
      s"expected exactly the $expected probed cell directories, got " +
        s"${scans.head.selectedPartitions.partitionCount}")
  }

  test("q164's probe-set memo is latest-only across corpus generations") {
    // r15 verdict item 3: the old per-key ConcurrentHashMap retained an
    // entry for every (corpus fp, book digest) a long-lived serving JVM
    // ever crossed — unbounded across generations. The memo is now a
    // single latest-only slot: a new generation's key evicts the stale
    // one. The probe set itself derives from the UNFILTERED corpus
    // (pure function of the key — see probedCellsFor's scaladoc).
    import org.apache.spark.sql.functions._
    import graft.queries.SimilarityQueries
    val book = graft.llm.ServeBooks.coarse(spark, sfDir)
    val keyA = (graft.ArtifactStore.embeddingsFp(spark, sfDir),
      graft.llm.ServeBooks.bookDigest(book))
    val p1 = SimilarityQueries.probedCellsFor(spark, sfDir, book)
    assert(p1.nonEmpty, "witness: the query set must probe something")
    assert(SimilarityQueries.probedMemoKeyForTest.contains(keyA))

    // generation B: the same vectors under one changed label — a
    // different embeddings fingerprint, same book
    val tmp = java.nio.file.Files.createTempDirectory("probe_memo").toString
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("label",
        when(col("vec_id") === 0, col("label") + 1).otherwise(col("label")))
      .coalesce(1).write.parquet(s"$tmp/embeddings.parquet")
    val keyB = (graft.ArtifactStore.embeddingsFp(spark, tmp),
      graft.llm.ServeBooks.bookDigest(book))
    assert(keyB != keyA, "witness: the copy must fingerprint differently")
    val p2 = SimilarityQueries.probedCellsFor(spark, tmp, book)
    assert(p2.toSet == p1.toSet,
      "same vectors, same book → same probe set (label is not geometry)")
    assert(SimilarityQueries.probedMemoKeyForTest.contains(keyB),
      "the new generation must own the slot")
    assert(!SimilarityQueries.probedMemoKeyForTest.contains(keyA),
      "the stale generation's entry must not be retained")
  }

  test("audit truth arms ride graft_topk: no WindowExec outside the serve arm") {
    // r9 verdict item 3: the exact arm of every ANN audit used to sort
    // all Q×N scored pairs in a per-query row_number window; it now
    // aggregates through the bounded graft_dsort+graft_topk heap. The
    // only windows left belong to the serve arms' bounded re-ranks.
    // r17: the L2 truth arm of the ADC audits is served from the
    // brute_l2_topk_v1 artifact — graft_topk runs once in its build,
    // so the audits' own plans must show the store FileScan instead
    // r17 second pass: the APPROXIMATE arms are served from the
    // ann_topk_* stores too (their shortlist/re-rank windows run once
    // in the store builds), so every audit plan is now fully
    // windowless — two FileScans and a join, nothing corpus-shaped.
    val expectWindows = Map(
      "q31_knn_brute" -> 0,   // pure truth — fully windowless
      "q134_prefix_recall" -> 0, // both arms brute — fully windowless
      "q129_ann_recall" -> 0, // ivf arm off ann_topk_ivf_v1
      "q162_adc_recall" -> 0, // pq arm off ann_topk_pq_v1
      "q163_int8_recall" -> 0, // int8 arm off ann_topk_int8_v1
      "q165_res_recall" -> 0, // res arm off ann_topk_res_v1
      "q168_adc_rank_audit" -> 0) // both arms off their stores
    // (query, substrings its plan must contain): the L2-truth store for
    // the ADC audits, the arm store each audit grades, and the bounded
    // heap for the still-inline cosine truth arm of q129
    val expectScans = Map(
      "q129_ann_recall" -> Seq("graft_topk", "ann_topk_ivf_v1"),
      "q162_adc_recall" -> Seq("brute_l2_topk_v1", "ann_topk_pq_v1"),
      "q163_int8_recall" -> Seq("brute_l2_topk_v1", "ann_topk_int8_v1"),
      "q165_res_recall" -> Seq("brute_l2_topk_v1", "ann_topk_res_v1"),
      "q168_adc_rank_audit" -> Seq("brute_l2_topk_v1", "ann_topk_pq_v1",
        "ann_topk_res_v1"),
      "q31_knn_brute" -> Seq("graft_topk"),
      "q134_prefix_recall" -> Seq("graft_topk"))
    for ((q, n) <- expectWindows) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val wins = df.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(wins.size == n,
        s"$q: expected $n serve-arm windows, got ${wins.size} — " +
          "an arm pipeline crept back into the audit plan")
      val p = plan(q)
      for (needle <- expectScans(q))
        assert(p.contains(needle),
          s"$q: plan must read $needle (store-served audit shape)")
    }
  }

  test("q166 CMS build merges partial sketches: partial agg before the " +
      "one hash exchange") {
    // the exchange must carry ≤ d·w cells per partition (local
    // sketches), not token rows — i.e. a partial HashAggregate sits
    // below the first shuffle, and the only exchanges are the merge
    // and the presentation sort
    val p = plan("q166_cms_sketch")
    val nEx = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(nEx <= 2, p.take(1200))
    assert(p.contains("partial_count"),
      "map-side combine must feed the shuffle:\n" + p.take(1200))
  }

  test("q167 CMS estimate: the sketch side broadcasts, the corpus joins no corpus") {
    // the ≤ d·w-cell sketch must reach the estimate join as a broadcast
    // build side — a shuffled join here would re-exchange the exact
    // counts for a 256-row lookup table
    val p = plan("q167_cms_estimate")
    assert(p.contains("BroadcastHashJoin"), p.take(1000))
    assert(!p.contains("SortMergeJoin"),
      "the sketch lookup must not shuffle:\n" + p.take(1000))
  }

  test("q172 LM scoring: partial per-doc fold before the shuffle, vocab " +
      "scalar broadcast, pruned corpus scan") {
    val p = plan("q172_lm_score")
    assert(p.contains("partial_sum"),
      "per-doc probability fold must combine map-side:\n" + p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      "the count-table lookups must not sort-merge at this scale:\n" + p.take(1200))
    val reads = "ReadSchema: struct<[^>]*>".r.findAllIn(p).toList
    assert(reads.nonEmpty && reads.forall(r =>
      !r.contains("lang") && !r.contains("source") && !r.contains("n_chars")),
      s"corpus scans must read only (doc_id, text): $reads")
  }

  test("q173 split repair: the label artifact broadcasts against a " +
      "doc_id-only scan") {
    val p = plan("q173_split_repair")
    assert(p.contains("BroadcastHashJoin"), p.take(1000))
    assert(!p.contains("SortMergeJoin"),
      "the tiny label frame must broadcast:\n" + p.take(1000))
    val reads = "ReadSchema: struct<[^>]*>".r.findAllIn(p).toList
    val corpus = reads.find(_.contains("doc_id:bigint"))
    assert(corpus.isDefined && !corpus.get.contains("text"),
      s"the corpus side must scan doc_id only: $reads")
  }

  test("q169 time travel: per-version compaction is the argmax partial agg, " +
      "no window") {
    val df = graft.SparkEntry.queries("q169_time_travel")(spark, sfDir)
    assert(df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "q169 must compact via max(struct), not a per-key sort window")
  }

  test("q170 SCD-2: exactly one window, keyed on doc_id") {
    val df = graft.SparkEntry.queries("q170_scd2")(spark, sfDir)
    val parts = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.flatMap(_.references.map(_.name))
    }
    assert(parts.size == 1 && parts.head.forall(_.contains("doc_id")),
      s"expected one doc_id-keyed interval window, got $parts")
  }

  test("q158 health audit is windowless: row-local assignment, one partial agg") {
    val df = graft.SparkEntry.queries("q158_ivf_health")(spark, sfDir)
    val p = plan("q158_ivf_health")
    assert(df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "q158 must not window — the argmin is row-local")
    val firstExchange = p.indexOf("Exchange")
    assert(firstExchange >= 0 && p.substring(firstExchange).contains("HashAggregate"),
      "per-cell stats must partial-aggregate before the exchange")
  }

  test("q161 probe sweep: every window is (budget, query)-partitioned") {
    val df = graft.SparkEntry.queries("q161_probe_curve")(spark, sfDir)
    val partNames = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.flatMap(_.references.map(_.name))
    }
    assert(partNames.nonEmpty && partNames.forall(ns =>
      ns.contains("query_id") || ns.contains("n_probes")),
      s"q161 windows must stay per-(budget, query): $partNames")
    assert(partNames.forall(!_.contains("vec_id")),
      "no per-vector window may reappear in the sweep")
  }

  test("q151 head sample is a bounded heap; the gap window is df-capped") {
    // r7 verdict item 2: a stopword-grade term must never become one
    // reducer's full-list window sort. The head rides graft_topk; the
    // only window left (gap_max) runs over the df-cap join's output.
    val df = graft.SparkEntry.queries("q151_inverted_index")(spark, sfDir)
    val plan = df.queryExecution.sparkPlan
    val wins = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.size == 1, s"expected exactly the gap window, got ${wins.size}")
    assert(wins.head.collectFirst {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isDefined, "gap window must consume the df-capped join, not raw postings")
    assert(plan.toString.contains("graft_topk"),
      "postings head must ride the bounded graft_topk heap")
  }

  test("q88/q196 are fully store-served; q98 scans the corpus only for " +
    "the text rebuild") {
    for (q <- Seq("q88_dup_spans", "q196_dup_longest_run")) {
      val p = plan(q)
      assert(p.contains("gram_occ8_v1") && p.contains("gram_stats8_v1") &&
        p.contains("doclens_v1"),
        s"$q must read the span-gram + doclen stores:\n${p.take(1200)}")
      assert(!p.contains("documents.parquet"),
        s"$q must not touch corpus text — every arm is a store read")
    }
    val p98 = plan("q98_dup_span_remove")
    assert(p98.contains("gram_occ8_v1") && p98.contains("gram_stats8_v1"),
      p98.take(1200))
    assert(p98.contains("documents.parquet"),
      "q98's clean_text rebuild must still read the corpus (intrinsic: " +
        "the output embeds excised text)")
  }

  test("q72 fuzzy join generates candidates by equality, never all-pairs") {
    // the BUILD path (the served query is a fuzzy_pairs_v1 FileScan —
    // its plan proves nothing about candidate generation)
    val p = RelationalQueries.fuzzyJoinDirect(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
  }

  test("q72 serves from the fuzzy_pairs_v1 store, equals the deletion-" +
    "variant build, and rebuilds nothing on reuse") {
    def pSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val served = graft.SparkEntry.queries("q72_fuzzy_join")(spark, sfDir)
    assert(pSet(served) == pSet(RelationalQueries.fuzzyJoinDirect(spark, sfDir)),
      "the served pair list must equal the from-scratch SymSpell build")
    val builds = graft.ArtifactStore.buildCount.getOrDefault("fuzzy_pairs_v1", 0)
    val again = graft.SparkEntry.queries("q72_fuzzy_join")(spark, sfDir)
    assert(graft.ArtifactStore.buildCount.getOrDefault("fuzzy_pairs_v1", 0) == builds,
      "a same-names rerun must serve the published pairs, not rebuild")
    val p2 = again.queryExecution.executedPlan.toString
    assert(p2.contains("fuzzy_pairs_v1") && !p2.contains("customer"),
      s"the served pairs must FileScan the store, not the corpus:\n$p2")
  }

  test("q30 above the brute gate falls through to the LSH bucket join") {
    // gateRows=0 forces the over-gate path; the plan must contain no
    // all-pairs join of any kind.
    val df = SimilarityQueries.embedNearDupGated(spark, sfDir, gateRows = 0L)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
  }

  test("q76 decontamination broadcasts the eval shingles; training side never shuffles them") {
    val p = plan("q76_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the 100 TB training shingle set must meet the benchmark suite via broadcast, not a shuffle")
  }

  test("q75 serves from the flags artifact; the builder's windows stay partitioned") {
    // the flag pipeline is the verdict_flags_v1 documents artifact
    // (cluster_labels_v1's pattern): the SERVED plan is scan-shaped —
    // no windows, no joins — while the one-time builder keeps the
    // digest window partitioned and join-free beyond the bigram leg
    val df = graft.SparkEntry.queries("q75_curation_verdict")(spark, sfDir)
    assert(df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "q75 must read the flags artifact, not recompute the windows")
    val build = TextStatsQueries.buildVerdictFlags(spark, sfDir)
    val windows = build.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec
    }
    assert(windows.nonEmpty && windows.forall(_.nonEmpty),
      "the builder's canonical-digest window must partition by digest")
    val p = build.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
  }

  test("q91 iteration step: one equi-join, no cartesian, BIGINT-only shuffle keys") {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.LongType
    // the step plan is asserted directly — localCheckpoint truncates the
    // returned query's lineage, so the iteration joins never appear there
    val (edges, deg) = AnalyticsQueries.prGraph(spark, sfDir)
    val pr = deg.select(col("node"), col("deg"), lit(1000000L).as("pr"))
    val step = AnalyticsQueries.prStep(pr, edges, 50L)
    val plan = step.queryExecution.sparkPlan
    val p = step.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(1200))
    // exactly ONE rank×edges join per iteration — the rank update folds
    // into the aggregation off the edge-carried deg_dst (no degree
    // re-join; r17: one fewer shuffle stage per iteration)
    val joins = plan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j.leftKeys
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j.leftKeys
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j.leftKeys
    }
    assert(joins.size == 1, s"expected 1 equi-join per iteration, got ${joins.size}")
    assert(joins.flatten.forall(_.dataType == LongType),
      "iteration join keys must be BIGINT node ids — VARCHAR must never ride " +
        "the per-iteration shuffles")
    // exchanges exist only post-EnsureRequirements; unwrap the AQE root
    val physical = step.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val shuffleKeys = physical.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.outputPartitioning match {
          case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
            h.expressions
          case _ => Seq.empty
        }
    }.flatten
    assert(shuffleKeys.nonEmpty && shuffleKeys.forall(_.dataType == LongType),
      "every iteration shuffle must hash-partition on BIGINT keys only")
  }

  test("q77/q101/q102 assignment is row-local: no crossJoin, no per-vector window") {
    // r9 verdict item 1: the curation trio's old shape fanned every
    // vector ×32 through crossJoin(broadcast(cents)) + row_number over
    // vec_id — a corpus-scale exchange plus sort. Assignment now rides
    // the native graft_ivf_cell argmin over the collected
    // CurationSnapshot book (the serve trio's pattern); the only
    // windows left are cell-partitioned (q77's quota) — q102 has none.
    for (q <- Seq("q77_semantic_sample", "q101_semdedup_prune",
        "q102_centroid_update")) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val partNames = df.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec =>
          w.partitionSpec.flatMap(_.references.map(_.name))
      }
      assert(partNames.forall(_.nonEmpty),
        s"$q: every remaining window must be partitioned, got $partNames")
      assert(partNames.forall(!_.contains("vec_id")),
        s"$q: the ×32 per-vector assignment window is back: $partNames")
      val p = plan(q)
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"$q: the centroid crossJoin fan-out is back:\n" + p.take(1200))
      assert(p.contains("graft_ivf_cell"),
        s"$q: assignment must ride the native plan-literal argmin")
    }
    // q102 is fully row-local before its one partial-aggregated groupBy
    val q102 = graft.SparkEntry.queries("q102_centroid_update")(spark, sfDir)
    assert(q102.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "q102 must not window at all")
    assert(!plan("q102_centroid_update").contains("Join"),
      "q102 needs no centroid relation — dist is never read downstream")
  }

  test("q89/q109/q111 sketch via the bounded KMV aggregate: no windows anywhere") {
    Seq("q89_kmv_distinct", "q109_kmv_overlap", "q111_column_profile")
      .foreach { q =>
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val windows = df.queryExecution.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
        assert(windows.isEmpty,
          s"$q: the native graft_kmv aggregate replaced the rank prune — " +
            "a WindowExec means a full sort crept back in")
        assert(plan(q).contains("graft_kmv"), s"$q must aggregate via graft_kmv")
      }
  }

  test("q123 IVM: both scans carry pushed doc_id splits; combine joins on the group key") {
    val p = plan("q123_ivm_agg")
    assert(p.contains("LessThan(doc_id,250") &&
      p.contains("GreaterThanOrEqual(doc_id,250"),
      "the snapshot/delta split must reach the parquet scans as pushed filters")
    // the combine is group-cardinality-sized: no scan-sized shuffle join
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("q115 probes the bloom below the semi join's exchange, and the join stays exact") {
    val df = graft.SparkEntry.queries("q115_bloom_semijoin")(spark, sfDir)
    val smj = df.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }
    assert(smj.nonEmpty,
      "the exact semi join must remain (merge-hinted: the at-scale dim side " +
        "is beyond broadcast) — the bloom alone admits false positives")
    // the probe filter must sit on the join's STREAMED (fact) side, below
    // its exchange: probable-miss rows are dropped before they ship
    val probeFilters = smj.head.left.collect {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.condition.exists(_.isInstanceOf[graft.functions.BloomProbe]) => f
    }
    assert(probeFilters.nonEmpty,
      "graft_bloom_probe must pre-filter the fact side beneath the semi join")
  }

  test("q135 skew audit: partial aggregation only — no windows, no joins") {
    val df = graft.SparkEntry.queries("q135_skew_audit")(spark, sfDir)
    val plan = df.queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, "the arg-max fold must not use a rank window")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "per-column profiles fold independently; nothing should join")
  }

  test("q133 autocorr: exactly one window (the lag); sums partial-aggregate") {
    val df = graft.SparkEntry.queries("q133_autocorr")(spark, sfDir)
    val windows = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.size == 1,
      s"expected only the per-group lag window, found ${windows.size}")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val firstExchange = p.indexOf("Exchange")
    assert(firstExchange >= 0 && p.substring(firstExchange).contains("HashAggregate"),
      "the five monoids must combine map-side after the window")
  }

  test("q143 CDC chunking is row-local: no joins, no windows, no mid-plan exchange") {
    val df = graft.SparkEntry.queries("q143_cdc_chunks")(spark, sfDir)
    val plan = df.queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, "chunk boundaries are per-row; no window may appear")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("CartesianProduct"), "CDC must not join anything")
    // at most one exchange: the presentation sort's range partitioning —
    // the chunker itself never shuffles
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e }
    assert(exchanges.size <= 1, "only the final ORDER BY may exchange")
  }

  test("q142 LSH audit: equi-joins only, windowless, shingle scan feeds both arms") {
    val p = plan("q142_lsh_audit")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "both arms must stay inverted-index equi-join-shaped")
    val windows = graft.SparkEntry.queries("q142_lsh_audit")(spark, sfDir)
      .queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, "bucketed recall is a partial agg, not a window")
  }

  test("q144 cascade: scan-shaped legs — the only window is q79's pack sum, no row joins") {
    val df = graft.SparkEntry.queries("q144_takedown_cascade")(spark, sfDir)
    val plan = df.queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.size <= 2,
      s"only the pack running sum may window (pk feeds two legs): ${windows.size}")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "takedown flags are computed in place — no leg may join a takedown list")
  }

  test("q145 canonical pick: one partial agg over the labels join, windowless") {
    val df = graft.SparkEntry.queries("q145_canonical_pick")(spark, sfDir)
    val plan = df.queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, "the argmax is a scalar max_by key, never a window")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "labels join docs on 8-byte ids only")
  }

  test("q146 mixture alloc: corpus scan aggregates before any per-source math") {
    val df = graft.SparkEntry.queries("q146_mixture_alloc")(spark, sfDir)
    val plan = df.queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.size == 1,
      s"only the #sources-row remainder rank may window: ${windows.size}")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct"), "scalar combines must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "nothing after the per-source rollup is big enough to shuffle-join")
  }

  test("q147 dsir affinity: fixed-size histogram broadcasts, zero windows") {
    val df = graft.SparkEntry.queries("q147_dsir_affinity")(spark, sfDir)
    val plan = df.queryExecution.sparkPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, "per-doc dots are partial aggs, never windows")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin"),
      "the 4096-row global histogram must broadcast back to the doc counts")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "no corpus-sized shuffle join anywhere in the affinity path")
  }

  test("q132 k-core rounds join on 8-byte node ids only, no cartesian") {
    // the BUILD arm (the served query is a kcore_deg_v1 FileScan —
    // its plan proves nothing about the peel's join shape)
    val direct = AnalyticsQueries.kcoreDirect(spark, sfDir)
    val p = direct.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "peel rounds must stay equi-join-shaped")
    val windows = direct.queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
    assert(windows.isEmpty, "degree counting must be a partial agg, not a window")
  }

  test("q149 BFS rounds stay equi-join-shaped on 8-byte node ids") {
    // the BUILD arm (the served query is a bfs_hops_v1 FileScan)
    val p = AnalyticsQueries.bfsHopsDirect(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "frontier expansion must stay equi-join-shaped")
    assert(!p.contains("Window"), "hop minimization is an agg, not a window")
  }

  test("q150 power iteration never re-joins the corpus") {
    // the only corpus-sized work is q116's one-pass covariance, pinned
    // behind a localCheckpoint; the iteration joins D-row/D²-row frames
    val p = plan("q150_pca_power")
    assert(!p.contains("CartesianProduct"), "no cartesian in the matmul")
    assert(!p.contains("embeddings.parquet"),
      "corpus scan must be checkpoint-pinned, not re-planned per round")
  }


  test("q152 sketch aggregates partially and never sorts the corpus") {
    val p = plan("q152_quantile_sketch")
    assert(p.contains("partial_graft_topk") || p.contains("graft_topk"),
      "sample must ride the native heap aggregate")
    assert(!p.contains("Window"),
      "quantile extraction must be array-local, not a window sort")
    val smj = "SortMergeJoin".r.findAllIn(p).size
    assert(smj == 0, "targets join must broadcast")
  }
}
