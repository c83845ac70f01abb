package graft.queries

import graft.Tables
import graft.llm.VectorOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Similarity search over the `embeddings` table (64-dim `array<float>`):
  * brute-force cosine as the correctness baseline, multi-table
  * random-hyperplane sign-LSH and a trained-codebook IVF as the scale
  * paths. Cosine is a strict left-fold (graft.llm.VectorOps) and
  * bit-matches DuckDB's `list_cosine_similarity`, so everything here is
  * exact-oracle-able.
  *
  * Scale posture: the brute paths are gated/bounded (q30 falls through
  * to the LSH bucket join above [[BruteGateRows]]; q31's query set is
  * fixed); the approximate paths replace pair enumeration with
  * bucket-equality joins whose cost is Σ_bucket |q∩bucket|·|bucket|.
  */
object SimilarityQueries {

  private val QuerySetSize = 50
  private val K = 5
  // q52/q30-LSH near-dup bucket width: 8 sign bits → 256 buckets.
  private val LshBits = 8

  // q32 ANN hash family: 6 tables × 10 random-hyperplane bits, each
  // query probing its bucket plus all Hamming≤2 perturbations (56
  // probes/table). Measured on sf0.01: recall@5 = 0.69 examining ~29%
  // of the corpus (vs 0.14 for the old single-table axis-aligned 8-bit
  // code). (tables, bits, probe radius) is the recall/cost dial: denser
  // corpora at constant bits raise bucket occupancy, so at scale one
  // ADDS bits to hold candidate fraction constant.
  private val PlaneTables = 6
  private val PlaneBits = 10
  private lazy val Planes =
    VectorOps.hyperplanes(PlaneTables, PlaneBits, VectorOps.Dim)
  private val ProbeMasks: Seq[Long] =
    (0L +: (0 until PlaneBits).map(j => 1L << j)) ++
      (for { i <- 0 until PlaneBits; j <- i + 1 until PlaneBits }
        yield (1L << i) | (1L << j))

  /** Vectors with their norm precomputed once per row — the pair stage
    * then pays a single 64-term dot per pair (`dot/(nrm_a*nrm_b)` is the
    * identical expression tree to `dot/(sqrt(dot aa)*sqrt(dot bb))`, so
    * oracle parity is preserved while per-pair work drops 3×). */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        VectorOps.toDoubleArr(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))

  /** [[vecs]] minus the vector tombstone set — the SERVE queries'
    * corpus view (q55/q64/q113/q164): a taken-down vector must vanish
    * from top-K immediately, before any retrain lands
    * ([[graft.sources.VecTakedown]]). The tombstone side is bounded by
    * deletion volume and broadcasts; the oracles mirror the exclusion
    * with a NOT IN over the same published parquet. Audit/analysis
    * queries deliberately stay on [[vecs]] — recall is measured
    * against the full corpus until the index is rebuilt. */
  private def vecsServed(s: SparkSession, dir: String): DataFrame =
    vecs(s, dir).join(
      broadcast(graft.sources.VecTakedown.tombstones(s, dir)),
      Seq("vec_id"), "left_anti")

  /** q32's sign-plane bucket table, served (`lsh_buckets_p6_v1`,
    * embeddings fingerprint): one (vec_id, table, bucket) row per
    * vector per plane table — a pure function of the corpus and the
    * frozen plane set that q32 re-derived per run (PlaneTables × Dim
    * dot products per vector). The IVF side's ann-cells store pattern
    * applied to the sign-LSH index. Takedown posture: q32 is an
    * audit/analysis query on the FULL corpus (the [[vecs]] note —
    * recall is measured against everything until the index rebuilds),
    * so flag/reset deliberately do not invalidate this key; an erasing
    * corpus rewrite moves the fingerprint and the parked generation
    * falls to gcKeepLatest like the codes stragglers
    * (brute_l2_topk_v1's posture). */
  private[queries] def lshBuckets(s: SparkSession, dir: String): DataFrame =
    graft.ArtifactStore.parquetOnce(s, "lsh_buckets_p6_v1",
      graft.ArtifactStore.embeddingsFp(s, dir))(
      lshBucketsDirect(s, dir)).drop("fp")

  /** The from-scratch bucket derivation (spec reference arm). */
  private[queries] def lshBucketsDirect(s: SparkSession, dir: String): DataFrame = {
    val tb = explode(array((0 until PlaneTables).map(t =>
      struct(lit(t).as("t"),
        VectorOps.planeBucket(col("v"), Planes(t)).as("bkt"))): _*))
    vecs(s, dir).select(col("vec_id"), tb.as("tb"))
      .select(col("vec_id"), col("tb.t").as("t"), col("tb.bkt").as("bkt"))
  }

  /** Above this row count the all-pairs brute join is a scale-killer;
    * q30 falls through to the bucketed LSH join instead (SURVEY §6's
    * "brute gated by row count"). 10⁴ rows ≈ 5·10⁷ pairs — the most a
    * single query should ever pay for ground truth. */
  private[queries] val BruteGateRows = 10000L

  /** q30 — near-dup pairs with the row-count gate: exact all-pairs below
    * [[BruteGateRows]] (every sf the oracle runs at), the q52 bucketed
    * LSH join above it. The gate is one metadata-only parquet count. */
  def embedNearDup(s: SparkSession, dir: String): DataFrame =
    embedNearDupGated(s, dir, BruteGateRows)

  def embedNearDupGated(s: SparkSession, dir: String, gateRows: Long): DataFrame =
    graft.Gate.byCount(Tables.embeddings(s, dir), gateRows)(
      embedNearDupBrute(s, dir))(
      embedNearDupLsh(s, dir))

  /** Ungated all-pairs ground truth — only ever reached via the gate.
    * Served from `vec_pair_cos_v1` (round 17): the verified near-dup
    * pair list is a pure function of the embeddings corpus and IS the
    * blocklist a curation pipeline persists — the doc-side
    * brute_pair_stats_v1 / r17 brute_l2_topk_v1 discipline applied to
    * the vector near-dup family. The N²/2 scan runs once per corpus;
    * the oracle recomputes the quadratic join from the corpus, so the
    * gate proves the store equals brute force. Takedown posture as
    * [[lshBuckets]]: full-corpus audit semantics by design, parked
    * generations fall to gcKeepLatest after an erasing rewrite. */
  private def embedNearDupBrute(s: SparkSession, dir: String): DataFrame =
    graft.ArtifactStore.parquetOnce(s, "vec_pair_cos_v1",
      graft.ArtifactStore.embeddingsFp(s, dir))(
      embedNearDupBruteDirect(s, dir)).drop("fp")
      .orderBy(col("vec_a"), col("vec_b"))

  /** The from-scratch all-pairs scan (the artifact's build thunk and
    * the spec's reference arm). */
  private[queries] def embedNearDupBruteDirect(s: SparkSession,
                                               dir: String): DataFrame = {
    val e = vecs(s, dir)
    val cos = VectorOps.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .where(cos >= 0.4)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cos.as("cos"))
  }

  /** q31 — brute-force cosine top-k for a fixed query set (vec_id < 50).
    *
    * The per-query ranking rides the bounded `graft_topk` heap (q107's
    * idiom — r9 verdict item 3), NOT a row_number window: the window
    * plan shuffles and SORTS all Q×N scored pairs (every corpus row,
    * per query), where the heap aggregate combines map-side to ≤ K
    * pairs per partition per query — at 100 TB the truth arm's cost is
    * the scan, not a sort. The DOUBLE cosine rides the heap's BIGINT
    * score through the order-isomorphic `graft_dsort` bits codec and
    * is restored bit-identically by `graft_dsort_inv`; the tag is the
    * zero-padded neighbor id, so the heap's (score desc, tag asc)
    * order IS the oracle's (cos DESC, neighbor_id). */
  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val q = e.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val cos = VectorOps.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    q.crossJoin(e).where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .groupBy(col("query_id"))
      .agg(call_function("graft_topk",
        call_function("graft_dsort", col("cos")),
        lpad(col("neighbor_id").cast("string"), 20, "0"), lit(K))
        .as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("i", "e")))
      .select(col("query_id"), col("e.tag").cast(LongType).as("neighbor_id"),
        call_function("graft_dsort_inv", col("e.score")).as("cos"),
        (col("i") + 1).cast(LongType).as("rn"))
      .orderBy(col("query_id"), col("rn"))
  }

  // q193/q194 dial: the RADIUS — return every neighbor at cosine ≥ τ,
  // not a fixed K. 0.3 sits in the populated regime of the synthetic
  // embeddings at every tested sf (measured: 184/202/790 rows at
  // sf0.001/0.01/0.1) while staying selective.
  private[graft] val RadiusTau = 0.3

  /** q193 — RADIUS (range) similarity search, the ANN API's other
    * half: top-K (q31/q55) answers "the K nearest whatever their
    * similarity"; a dedup/retrieval tier as often needs "EVERY
    * neighbor at cosine ≥ τ, however many" (SemDeDup's ε-ball, RAG
    * recall floors, near-dup sweeps). Exact arm: all (query, neighbor)
    * pairs at cosine ≥ [[RadiusTau]], no rank, no cap — the result IS
    * the ε-ball. Brute over the bounded query set (q31's gated-truth
    * posture: at corpus scale the serve arm is q194 and this is the
    * recall oracle). Unbounded-output caveat by design: radius queries
    * return data-dependent row counts — the operator reports the ball,
    * the caller budgets τ. */
  def radiusSearch(s: SparkSession, dir: String): DataFrame =
    radiusExactArm(s, dir).orderBy(col("query_id"), col("neighbor_id"))

  /** The exact ball WITHOUT the presentation sort — shared by q193,
    * q198's truth arm, and the LIVE feed's recall audit
    * ([[graft.streaming.StreamAnnServe.radiusRecallAudit]]) (a
    * mid-plan global order would be dead weight under the recall
    * aggregation). */
  private[graft] def radiusExactArm(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val q = e.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val cos = VectorOps.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    q.crossJoin(e).where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .where(col("cos") >= RadiusTau)
  }

  /** q194 — radius search over the IVF SERVE feed (q55's probed
    * cells, tombstone-excluded): the production shape — candidates
    * come from the probe list's cells, never a corpus scan, and the
    * two arms differ only by feed recall (the q55/q31, q190/q189
    * exact+ANN pairing applied to range queries). A neighbor lives in
    * exactly one cell and probes are distinct, so no dedup step is
    * needed; the threshold filter is row-local on the candidate join's
    * output. */
  def radiusSearchIvf(s: SparkSession, dir: String): DataFrame =
    radiusIvfArm(s, dir).orderBy(col("query_id"), col("neighbor_id"))

  private def radiusIvfArm(s: SparkSession, dir: String): DataFrame = {
    val book = graft.llm.ServeBooks.coarse(s, dir)
    val e = vecsServed(s, dir)
    val cells = e.select(col("vec_id"), col("v"), col("nrm"),
      graft.llm.ServeBooks.cell(book, col("v")).as("cell"))
    val probes = e.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"),
        explode(graft.llm.ServeBooks.probeCells(book, IvfProbes, col("v")))
          .as("probe"))
    val cos = VectorOps.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    probes
      .join(cells, col("probe") === col("cell") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .where(col("cos") >= RadiusTau)
  }

  /** q198 — radius recall audit, the q129/q165 discipline applied to
    * range queries: per query, the exact ball size (q193's arm), how
    * many of its members the IVF-probed arm (q194's) serves, and the
    * integer-ratio recall — the number an operator reads before
    * committing a probe budget to a radius SLA. Queries whose ball is
    * empty have no recall to report and are absent (the truth arm
    * drives the join). Integer milli-ratio — exact cross-engine. */
  def radiusRecall(s: SparkSession, dir: String): DataFrame =
    radiusRecallOver(radiusExactArm(s, dir), radiusIvfArm(s, dir))

  /** q198's recall tail over ANY served (query_id, neighbor_id) feed —
    * the batch q194 arm or the live `startRadius` loop's appended
    * answers (r15 verdict item 4: the serve loop gets the same audit
    * the batch arms have — one auditor, two feeds, the keynessOver
    * idiom). The served side is deduped so a replayed micro-batch's
    * re-appended answers cannot inflate hit counts. */
  private[graft] def radiusRecallOver(exact: DataFrame,
                                      served: DataFrame): DataFrame = {
    val hits = served.select(col("query_id"), col("neighbor_id"))
      .distinct().withColumn("hit", lit(1L))
    exact.select(col("query_id"), col("neighbor_id"))
      .join(hits, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("ball"),
        sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .withColumn("recall_milli", expr("(hits * 1000) div ball"))
      .orderBy(col("query_id"))
  }

  // q189 dials: rerank the top-MmrShortK relevance shortlist down to
  // MmrK diversified answers; λ = 0.7 relevance / 0.3 diversity — the
  // Carbonell & Goldstein 1998 default regime.
  private val MmrShortK = 20
  private val MmrK = 5

  /** q189 — Maximal Marginal Relevance rerank (Carbonell & Goldstein
    * 1998): greedily pick MmrK of the top-MmrShortK cosine shortlist,
    * each step maximizing λ·rel(c) − (1−λ)·max_{s∈Sel} cos(c, s) — the
    * diversified top-k a retrieval tier serves when near-duplicate
    * neighbors (exactly what a dedup-bearing corpus still has at serve
    * time) would otherwise fill all K slots. Ties break by neighbor_id;
    * step 1's empty-selection max is 0 (argmax unchanged either way).
    *
    * The greedy loop is K bounded DataFrame iterations (the q91
    * fixpoint idiom, K = 5 plan-time constant), each a join + window
    * over shortlist-sized frames — the corpus is touched ONLY by the
    * relevance arm; everything after the shortlist fetch is
    * queries × MmrShortK rows. The oracle unrolls the same K steps as
    * chained CTEs (no recursion needed at fixed K), so the whole
    * sequential-by-nature operator stays exact-oracled: cosine is
    * bit-identical cross-engine (VectorOps contract) and max() over
    * the same set is order-free.
    *
    * Scale shape: the relevance arm is q31's (gated brute at oracle
    * scale; a production tier feeds the shortlist from q55/q64's ANN
    * path instead — the rerank tail is feed-agnostic). Shortlist
    * vectors come back by a bounded broadcast fetch (q164's idiom);
    * the pair-similarity table is queries × K² rows, localCheckpointed
    * once and reused by all K steps. */
  def mmrRerank(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val q = e.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val cos = VectorOps.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("neighbor_id"))
    val short0 = q.crossJoin(e).where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("rel"))
      .withColumn("rn", row_number().over(wRel))
      .where(col("rn") <= MmrShortK)
    mmrOver(e, short0)
  }

  /** q190 — q189's greedy tail over the IVF SERVE feed (q55's probed
    * cells, tombstone-excluded): the exact+ANN pair the RRF twins
    * q90/q94 established, applied to diversification — the production
    * shape, where the shortlist comes from the index, not a corpus
    * scan. Rel is exact cosine among probed-cell candidates; the MMR
    * arithmetic, ties, and K are q189's, so the two arms differ only
    * by feed recall. */
  def mmrRerankIvf(s: SparkSession, dir: String): DataFrame = {
    val book = graft.llm.ServeBooks.coarse(s, dir)
    val e = vecsServed(s, dir)
    // the candidate feed reads the serve-cells GENERATION with q164's
    // probe-cell static pruning (r16 verdict item 5's A/B localized
    // the probe-scan cost to the inline per-run cell re-assignment —
    // a corpus-wide argmin the store already materialized once per
    // (corpus ⊗ book)): the query set's distinct probed cells filter
    // the raw partition column, so the scan lists and reads ONLY those
    // cells' directories. Rows in unprobed cells can never join; the
    // store's assignments are the same book's argmin (spec-pinned
    // store-vs-fresh equality), so the answer is unchanged.
    val probed = probedCellsFor(s, dir, book)
    val cands = s.read
      .parquet(graft.llm.ServeBooks.annCellsPath(s, dir))
      .where(col("cell").isin(probed: _*))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("cell").cast(LongType).as("cell"))
    val probes = e.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"),
        explode(graft.llm.ServeBooks.probeCells(book, IvfProbes, col("v")))
          .as("probe"))
    val cos = VectorOps.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("neighbor_id"))
    val short0 = probes
      .join(cands, col("probe") === col("cell") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("rel"))
      .withColumn("rn", row_number().over(wRel))
      .where(col("rn") <= MmrShortK)
    mmrOver(e, short0)
  }

  /** q190's shortlist + greedy tail over an EXPLICIT candidate cells
    * frame (vec_id, v, nrm, cell) and query batch (query_id, qv) — the
    * LIVE serve feed's entry point (r14 verdict item 3): the candidate
    * frame is [[graft.streaming.StreamAnnServe.candidates]]' pruned,
    * tombstone-excluded read of the serve-cells generation, so the
    * diversified tier reranks over exactly what the ANN tier serves.
    * Probe list, cosine, ties, K: q190's — one reranker, two feeds
    * (the spec pins identical output off the live snapshot vs the
    * batch feed at a quiesced boundary). */
  private[graft] def mmrServeOver(cands: DataFrame,
                                  book: Array[Array[Double]],
                                  queries: DataFrame): DataFrame = {
    val probes = queries
      .select(col("query_id"), col("qv"),
        VectorOps.norm(col("qv")).as("qnrm"),
        explode(graft.llm.ServeBooks.probeCells(book, IvfProbes, col("qv")))
          .as("probe"))
    val cos = VectorOps.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("neighbor_id"))
    val short0 = probes
      .join(cands, col("probe") === col("cell") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("rel"))
      .withColumn("rn", row_number().over(wRel))
      .where(col("rn") <= MmrShortK)
    mmrOver(cands.select(col("vec_id"), col("v"), col("nrm")), short0)
  }

  /** The greedy MMR tail over ANY (query_id, neighbor_id, rel)
    * shortlist and its vector source `e` (vec_id, v, nrm) — one
    * reranker, three feeds (brute q189, IVF q190, live serve).
    *
    * The greedy is PER-QUERY LOCAL: each step's argmax reads only its
    * own query's ≤ MmrShortK candidates and prior picks — there is no
    * cross-query dependency anywhere. So the scale-correct plan is ONE
    * shuffle (group by query_id) and one local pass per group, not the
    * r15 shape's K driver-looped global join/window/checkpoint rounds
    * (25+ stages of scheduling latency over frames of a few thousand
    * rows — A/B'd at sf0.1 solo min: q189 1.51 → 0.60 s, q190
    * 1.82 → 0.83 s, per-query shuffle → 0.4 MB; at a production query
    * batch the old shape's per-step global barriers would be strictly
    * worse). Embarrassingly parallel across queries — exactly how a
    * retrieval tier shards rerank work.
    *
    * Arithmetic is bit-identical to the former DataFrame form (the
    * exact-oracle contract): cosine = strict left-to-right dot (the
    * graft_dot loop, reproduced here over the same doubles) divided by
    * the same norm product; the score is (0.7·rel) − (0.3·msim) in
    * IEEE binary64 with the empty-selection msim pinned to 0.0
    * (coalesce's arm); ties break by neighbor_id ascending (the old
    * window order), expressed as a strict (mmr, −id) comparison. */
  private def mmrOver(e: DataFrame, short0: DataFrame): DataFrame = {
    // bounded broadcast fetch of the shortlist's vectors (q164's shape)
    val nv = e.select(col("vec_id").as("neighbor_id"), col("v").as("nv"),
      col("nrm").as("nnrm"))
    val short = nv.join(broadcast(short0), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("rel"),
        col("nv"), col("nnrm"))
    implicit val candEnc: org.apache.spark.sql.Encoder[MmrCand] =
      org.apache.spark.sql.Encoders.product[MmrCand]
    implicit val pickEnc: org.apache.spark.sql.Encoder[MmrPick] =
      org.apache.spark.sql.Encoders.product[MmrPick]
    implicit val keyEnc: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    short.as[MmrCand]
      .groupByKey(_.query_id)
      .flatMapGroups((qid: Long, it: Iterator[MmrCand]) => mmrGreedy(qid, it))
      .toDF()
      .orderBy(col("query_id"), col("step"))
  }

  private[graft] case class MmrCand(query_id: Long, neighbor_id: Long,
                                    rel: Double, nv: Array[Double],
                                    nnrm: Double)
  private[graft] case class MmrPick(query_id: Long, step: Long,
                                    neighbor_id: Long, rel: Double,
                                    mmr: Double)

  /** graft_dot's exact evaluation order (strict left-to-right
    * accumulation from 0.0 over the shorter length). */
  private def dotD(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** One query's greedy MMR selection — the per-group local pass. */
  private def mmrGreedy(qid: Long,
                        it: Iterator[MmrCand]): Iterator[MmrPick] = {
    val cands = it.toArray
    val sel = scala.collection.mutable.ArrayBuffer.empty[MmrCand]
    val picked = scala.collection.mutable.HashSet.empty[Long]
    val out = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
    var step = 1L
    while (step <= MmrK && sel.size < cands.length) {
      var best: MmrCand = null
      var bestMmr = 0.0
      for (c <- cands if !picked(c.neighbor_id)) {
        val msim =
          if (sel.isEmpty) 0.0 // the old coalesce(msim, 0.0) arm
          else {
            var m = Double.NegativeInfinity
            for (sc <- sel) {
              val cs = dotD(c.nv, sc.nv) / (c.nnrm * sc.nnrm)
              if (cs > m) m = cs
            }
            m
          }
        val mmr = 0.7 * c.rel - 0.3 * msim
        if (best == null || mmr > bestMmr ||
            (mmr == bestMmr && c.neighbor_id < best.neighbor_id)) {
          best = c; bestMmr = mmr
        }
      }
      out += MmrPick(qid, step, best.neighbor_id, best.rel, bestMmr)
      sel += best
      picked += best.neighbor_id
      step += 1L
    }
    out.iterator
  }

  /** q32 — multi-table random-hyperplane sign-LSH ANN. Each vector hashes
    * to one bucket per table (bit j = sign of the projection onto plane
    * j); each query probes its own bucket and every Hamming≤2 neighbor in
    * each table (a near-threshold projection flips its bit under small
    * perturbation, so low-Hamming buckets hold most of the missed
    * neighbors). Candidates are the DISTINCT union over tables — a
    * bucket-equality join per table, never a crossJoin — then ranked by
    * exact cosine. */
  def knnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    // both join sides read the served bucket table — the per-run
    // PlaneTables × Dim re-hash of every corpus vector is build-time
    val eb = lshBuckets(s, dir)
    // query probes: own bucket xor each Hamming≤2 mask
    val qb = eb.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("t"), col("bkt").as("qbkt"))
      .select(col("query_id"), col("t"),
        explode(array(ProbeMasks.map(m =>
          col("qbkt").bitwiseXOR(lit(m))): _*)).as("probe"))
    val cand = qb.as("p").join(eb.as("d"),
        col("p.t") === col("d.t") && col("p.probe") === col("d.bkt") &&
          col("d.vec_id") =!= col("p.query_id"))
      .select(col("p.query_id").as("query_id"),
        col("d.vec_id").as("neighbor_id"))
      .distinct()
    val q0 = e.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val cos = VectorOps.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.join(q0, col("query_id") === col("qid"))
      .join(e, col("neighbor_id") === col("vec_id"))
      .select(col("query_id"), col("neighbor_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .where(col("rn") <= K)
      .orderBy(col("query_id"), col("rn"))
  }

  /** q52 — the LSH scale path for near-dup pairs: candidates share a
    * sign bucket (bucket-equality join, no crossJoin), verified at
    * cosine ≥ 0.4. Approximate by design (cross-bucket near-dups are
    * missed — recall measured against brute-force q30); deterministic,
    * so it carries its own exact oracle. */
  def embedNearDupLsh(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
      .withColumn("bkt", VectorOps.signBucket(col("embedding"), LshBits))
    val cos = VectorOps.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))
    e.as("a").join(e.as("b"),
        col("a.bkt") === col("b.bkt") && col("a.vec_id") < col("b.vec_id"))
      .where(cos >= 0.4)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cos.as("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  // q55 IVF dials: 32 trained cells, 8 probes. Measured on sf0.01:
  // recall@5 = 0.83 examining ~27% of the corpus (the frozen first-16-
  // vectors codebook at 4 probes sat at 0.66/0.25 — training the
  // codebook buys recall at the same candidate budget).
  private val IvfProbes = 8

  /** Centroid relation from the PINNED curation snapshot
    * ([[graft.llm.CurationSnapshot]] — seeded from the historical
    * IvfCodebook pin, re-frozen only by the coded drift policy) — the
    * basis the CURATION queries (q77/q101/q102) cluster on, so their
    * verdicts are stable across retrains yet the pin itself has a
    * staleness contract. The SERVE queries (q55/q64/q113) read the
    * in-engine-trained [[graft.llm.ServeBooks]] artifact instead. */
  private def centroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.llm.CurationSnapshot.centroids(s, dir).toSeq.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toSeq) }
      .toDF("cid", "cv")
  }

  /** q55 — IVF (inverted-file) ANN, the second scale path beside
    * sign-LSH: every vector is assigned to its nearest coarse-codebook
    * cell, queries probe their 8 nearest cells, and ranking happens only
    * inside the probed cells. Join cost is Σ_cell |queries probing
    * cell|·|cell| — never a crossJoin.
    *
    * The codebook is TRAINED IN-ENGINE ([[graft.llm.ServeBooks.coarse]]:
    * PqTrain's DECIMAL-deterministic Lloyd at the serve geometry,
    * published to the corpus-fingerprinted ArtifactStore; the oracle
    * reads the same parquet). Assignment and probe-list are row-local
    * literal-argmin expressions over the ≈16 KiB collected book — no
    * crossJoin, no per-vector window, no shuffle before the candidate
    * join (r7 verdict item 8).
    */
  def knnIvf(s: SparkSession, dir: String): DataFrame =
    knnIvfCore(s, dir).orderBy(col("query_id"), col("rn"))

  /** q55's plan minus the presentation sort — the shape the
    * [[annTopk]] audit store materializes (r17: the audits read the
    * stored lists; THIS serve pipeline still runs per q55 query). */
  private[queries] def knnIvfCore(s: SparkSession, dir: String): DataFrame = {
    val book = graft.llm.ServeBooks.coarse(s, dir)
    val e = vecsServed(s, dir)
    val cells = e.select(col("vec_id"), col("v"), col("nrm"),
      graft.llm.ServeBooks.cell(book, col("v")).as("cell"))
    val probes = e.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"),
        explode(graft.llm.ServeBooks.probeCells(book, IvfProbes, col("v")))
          .as("probe"))
    val cos = VectorOps.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(cells, col("probe") === col("cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(wRank).cast(LongType))
      .where(col("rn") <= K)
  }

  /** q181 — label-FILTERED IVF ANN: q55's exact pipeline with a
    * metadata predicate fused into the candidate join — each query
    * retrieves its top-K among corpus vectors sharing ITS OWN label
    * (the production constraint behind per-tenant / per-language /
    * per-shard vector search: filter and rank in ONE pass, not
    * post-filtering an unfiltered top-K, which silently returns fewer
    * than K when the filter is selective). The label rides the cells
    * relation as a join predicate, so filtering happens BEFORE the
    * rank window touches a row — candidate volume shrinks by the label
    * selectivity (~10× here) relative to q55, and a query can still
    * fill its K from any probed cell.
    *
    * Queries whose probed cells hold fewer than K same-label vectors
    * return fewer rows — the IVF recall trade under filtering, which
    * is exactly what the audit consumer wants to see (a production
    * deployment reads short result lists as "raise the probe count for
    * filtered search").
    *
    * Scale shape: identical to q55 — row-local probe-list expressions
    * over the collected book, one equi-join on (cell, label-equality),
    * per-query top-K window over candidates only. */
  def knnIvfFiltered(s: SparkSession, dir: String): DataFrame = {
    val book = graft.llm.ServeBooks.coarse(s, dir)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label").cast(LongType).as("label"),
        VectorOps.toDoubleArr(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
      .join(broadcast(graft.sources.VecTakedown.tombstones(s, dir)),
        Seq("vec_id"), "left_anti")
    val cells = e.select(col("vec_id"), col("label"), col("v"), col("nrm"),
      graft.llm.ServeBooks.cell(book, col("v")).as("cell"))
    val probes = e.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("v").as("qv"), col("nrm").as("qnrm"),
        explode(graft.llm.ServeBooks.probeCells(book, IvfProbes, col("v")))
          .as("probe"))
    val cos = VectorOps.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(cells,
        col("probe") === col("cell") && col("vec_id") =!= col("query_id") &&
          col("label") === col("qlabel"))
      .select(col("query_id"), col("qlabel").as("label"),
        col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(wRank).cast(LongType))
      .where(col("rn") <= K)
      .orderBy(col("query_id"), col("rn"))
  }

  /** q77 — semantic-diversity sampling (the SemDeDup-family curation
    * step simplified to its scale skeleton): assign every embedding to
    * its nearest trained IVF cell, then cap each semantic cluster at a
    * 16-vector quota, keeping the most central (closest-to-centroid)
    * representatives — over-represented semantic regions are downsampled
    * while rare regions survive intact. Assignment is the row-local
    * [[graft.llm.ServeBooks.cell]] native argmin over the collected
    * snapshot book (the serve trio's pattern — r9 verdict item 1): no
    * crossJoin fan-out, no per-vector window, zero shuffle before the
    * one cell-partitioned quota window. The output `dist` (oracle-
    * hashed) is recomputed for the assigned cell only, via a broadcast
    * equi-join against the 32-row centroid relation, with the SAME
    * expression tree as the oracle's CTE — bit-identical doubles. */
  def semanticSample(s: SparkSession, dir: String): DataFrame = {
    val book = graft.llm.CurationSnapshot.centroids(s, dir)
    val e = vecs(s, dir)
    val cents = centroids(s, dir).withColumn("cnrm", VectorOps.norm(col("cv")))
    val dist = col("nrm") * col("nrm") -
      lit(2.0) * VectorOps.dot(col("v"), col("cv")) + col("cnrm") * col("cnrm")
    val assigned = e
      .withColumn("cell", graft.llm.ServeBooks.cell(book, col("v")))
      .join(broadcast(cents), col("cell") === col("cid"))
      .select(col("vec_id"), col("cell"), dist.as("dist"))
    val wCell = Window.partitionBy(col("cell"))
      .orderBy(col("dist"), col("vec_id"))
    assigned
      .withColumn("cell_rank", row_number().over(wCell).cast(LongType))
      .where(col("cell_rank") <= 16L)
      .orderBy(col("cell"), col("cell_rank"))
  }

  // ADC shortlist size before exact re-rank (the standard IVF-PQ
  // two-stage: quantized distances prune, exact distances decide).
  // 50 deep on sf0.01: recall@5 = 0.76 vs exact-L2 truth; at 20 the
  // 16-way-per-subspace quantization noise still evicts true neighbors
  // (0.56). The dial trades re-rank I/O for recall.
  private val PqShortlist = 50

  /** q64 — IVF-PQ with exact re-rank: the production-shaped two-level
    * ANN index. Coarse level = q55's trained IVF cells (probe 8 of 32);
    * fine level = candidates ranked by the ASYMMETRIC distance L2²(exact
    * query, PQ reconstruction) down to a 20-deep shortlist — this stage
    * needs only the candidate's 8-byte PQ code, 32× smaller than raw
    * float32, which is what makes a 100 TB index RAM-resident — then the
    * shortlist alone is re-ranked by exact L2 (the one stage that
    * touches raw vectors). Both codebooks are trained in-engine
    * (graft.llm.ServeBooks — PqTrain's DECIMAL-deterministic Lloyd,
    * corpus-fingerprinted artifact shared with the oracle), every
    * distance an identical expression tree in DuckDB —
    * exact-oracle-able end to end. */
  def knnIvfPq(s: SparkSession, dir: String): DataFrame =
    knnIvfPqCore(s, dir).orderBy(col("query_id"), col("rn"))

  /** q64's plan minus the presentation sort (the [[annTopk]] shape). */
  private[queries] def knnIvfPqCore(s: SparkSession, dir: String): DataFrame = {
    import graft.llm.{Pq, ServeBooks}
    val book = ServeBooks.coarse(s, dir)
    val pqBooks = ServeBooks.pq(s, dir)
    val e = vecsServed(s, dir)
    val cells = e.select(col("vec_id"), col("v"),
      Pq.reconstructWith(pqBooks)(col("v")).as("xhat"),
      ServeBooks.cell(book, col("v")).as("cell"))
    val probes = e.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(ServeBooks.probeCells(book, IvfProbes, col("v"))).as("probe"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("neighbor_id"))
    val shortlist = probes
      .join(cells, col("probe") === col("cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id").as("neighbor_id"),
        col("v").as("nv"), Pq.adc(col("qv"), col("xhat")).as("adc"))
      .withColumn("rs", row_number().over(wAdc))
      .where(col("rs") <= PqShortlist)
    val l2 = VectorOps.dot(col("qv"), col("qv")) -
      lit(2.0) * VectorOps.dot(col("qv"), col("nv")) +
      VectorOps.dot(col("nv"), col("nv"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("l2"), col("neighbor_id"))
    shortlist
      .select(col("query_id"), col("neighbor_id"), l2.as("l2"))
      .withColumn("rn", row_number().over(wRank).cast(LongType))
      .where(col("rn") <= K)
  }

  /** q164 — IVF-PQ with RESIDUAL encoding: IVFADC as actually published
    * (Jégou et al. 2011 §III.C — quantize r = v − c(v), not v itself).
    * Same two-stage plan as q64: coarse probe (8 of 32 trained cells),
    * ADC shortlist, exact re-rank. The difference is the reconstruction
    * x̂ = c(v) + PQ(r): the fine books spend their 16 cells per subspace
    * on the residual's far smaller support, so at the SAME 8-byte code
    * budget and the SAME shortlist depth the quantization noise — and
    * with it the shortlist's true-neighbor evictions — drops; q165
    * audits both arms against exact-L2 truth (residual recall ≥ raw at
    * every sf tested, AnnRecallSpec's measured numbers). Residual
    * books train in-engine against the served coarse book
    * ([[graft.llm.ServeBooks.pqRes]], corpus-fingerprinted artifact the
    * oracle also reads); assignment, residual, and reconstruction are
    * row-local expressions over ≈20 KiB of literal model state — no
    * crossJoin, no per-vector window, no shuffle before the candidate
    * join. */
  def knnIvfPqRes(s: SparkSession, dir: String): DataFrame = {
    // the PRECOMPUTED index: (vec_id, cell, codes) — encoding happens
    // once per corpus in the artifact build, never per query (the
    // production IVFADC topology; also avoids re-deriving the encode
    // argmin inside this plan, where consumer expressions would
    // duplicate it — measured 2–7× serve-time regressions)
    import graft.llm.ServeBooks
    val book = ServeBooks.coarse(s, dir)
    // probe-cell STATIC pruning (r14 verdict item 2, recovering the
    // cell-partitioned layout's small-file tax): the query set is
    // bounded, so its distinct probed cells collect driver-side (≤ 32
    // ints — one tiny job over the query vectors) and filter the RAW
    // partition column BEFORE the cast (StreamAnnServe.candidates'
    // idiom) — the scan lists and reads ONLY the probed cells'
    // directories; rows in unprobed cells can never join (the
    // candidate join keys probe === cell), so the answer is unchanged.
    // At corpus scale this is the load-bearing read shape: a probe set
    // touches its cells, never the whole index.
    val probed = probedCellsFor(s, dir, book)
    val codes = s.read.parquet(ServeBooks.pqResCodesPath(s, dir))
      .where(col("cell").isin(probed: _*))
      .select(col("vec_id"), col("cell").cast(LongType).as("cell"),
        col("codes"))
    knnIvfPqResOver(s, dir, codes)
  }

  /** q164's plan minus the presentation sort (the [[annTopk]] shape):
    * the same probe-pruned codes read feeding the shared serve tail. */
  private[queries] def knnIvfPqResCore(s: SparkSession, dir: String): DataFrame = {
    import graft.llm.ServeBooks
    val book = ServeBooks.coarse(s, dir)
    val probed = probedCellsFor(s, dir, book)
    val codes = s.read.parquet(ServeBooks.pqResCodesPath(s, dir))
      .where(col("cell").isin(probed: _*))
      .select(col("vec_id"), col("cell").cast(LongType).as("cell"),
        col("codes"))
    knnIvfPqResOverCore(s, dir, codes)
  }

  /** q164's probe set per (corpus fingerprint ⊗ coarse-book digest) —
    * the batch query set is the corpus's first [[QuerySetSize]]
    * vectors, so its probe plan is a PURE FUNCTION of (corpus, book):
    * computed by one bounded job per generation, memoized like the
    * fp/book memos (the file-incremental fingerprint key invalidates
    * on any corpus change, a retrained book digests differently). The
    * per-batch serving path deliberately does NOT ride this —
    * [[graft.streaming.StreamAnnServe.probedCells]] recomputes from
    * each live batch's actual queries.
    *
    * Two r15-advice hardenings: (1) the set is derived from the
    * UNFILTERED [[vecs]] — tombstones live outside the embeddings
    * fingerprint, so a served-view derivation could go stale against
    * the key; the unfiltered set is a superset by construction
    * (tombstoned queries just probe cells nothing joins — the
    * candidate join keys probe === cell, so the answer is unchanged)
    * and is exactly a function of the key. (2) the memo is
    * LATEST-ONLY: the old per-key map retained every generation a
    * long-lived serving JVM ever crossed; one (key → set) slot serves
    * the steady state (repeated queries over the current corpus) and
    * a generation change simply recomputes one bounded job. */
  private val probedMemo = new java.util.concurrent.atomic.AtomicReference[
    Option[((Long, Long), Seq[Int])]](None)

  /** The memo's current key — spec observability for the latest-only
    * contract (a stale generation's entry must not be retained). */
  private[graft] def probedMemoKeyForTest: Option[(Long, Long)] =
    probedMemo.get().map(_._1)

  private[graft] def probedCellsFor(s: SparkSession, dir: String,
                                    book: Array[Array[Double]]): Seq[Int] = {
    import graft.llm.ServeBooks
    val key = (graft.ArtifactStore.embeddingsFp(s, dir),
      ServeBooks.bookDigest(book))
    probedMemo.get() match {
      case Some((k, v)) if k == key => v
      case _ =>
        // single-flight under a cold or changed key (the old
        // computeIfAbsent's property): N concurrent q164 calls at
        // startup must run ONE probe job, not N
        probedMemo.synchronized {
          probedMemo.get() match {
            case Some((k, v)) if k == key => v
            case _ =>
              val v = vecs(s, dir).where(col("vec_id") < QuerySetSize)
                .select(explode(
                  ServeBooks.probeCells(book, IvfProbes, col("v"))).as("p"))
                .distinct().collect().map(_.getLong(0).toInt).toSeq
              probedMemo.set(Some((key, v)))
              v
          }
        }
    }
  }

  /** q164's serve tail over ANY codes frame (vec_id, cell, codes) —
    * the batch artifact or [[graft.streaming.StreamAnnIndex]]'s
    * stream-maintained target (StreamAnnIndexSpec proves both serve
    * identically). */
  def knnIvfPqResOver(s: SparkSession, dir: String,
                      codes: DataFrame): DataFrame =
    knnIvfPqResOverCore(s, dir, codes).orderBy(col("query_id"), col("rn"))

  private def knnIvfPqResOverCore(s: SparkSession, dir: String,
                                  codes: DataFrame): DataFrame = {
    import graft.llm.{Pq, ServeBooks}
    val book = ServeBooks.coarse(s, dir)
    val resBooks = ServeBooks.pqRes(s, dir)
    val e = vecsServed(s, dir)
    // x̂ = c(v) + PQ(r) via ONE native expression carrying both books
    // as a plan-literal spec (graft_pq_decode — BpeEncodeTbl's
    // pattern): a composed element_at form would fold the 32×64-double
    // coarse book into each of 64 output elements, and Catalyst
    // planning + codegen over that megabyte tree cost ~3.5 s of
    // driver time per execution (measured; stage wall time was 1.2 s)
    val spec = graft.functions.PqDecodeTable.toSpec(book, resBooks)
    val cells = codes.select(col("vec_id"), col("cell"),
      call_function("graft_pq_decode", col("cell"), col("codes"), lit(spec))
        .as("xhat"))
    val probes = e.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(ServeBooks.probeCells(book, IvfProbes, col("v"))).as("probe"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("neighbor_id"))
    val shortlist = probes
      .join(cells, col("probe") === col("cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id").as("neighbor_id"),
        Pq.adc(col("qv"), col("xhat")).as("adc"))
      .withColumn("rs", row_number().over(wAdc))
      .where(col("rs") <= PqShortlist)
    // only the ≤ Q·shortlist survivors fetch their raw vectors — the
    // re-rank stage's point lookups, not a corpus join; the shortlist
    // is bounded by query-set × depth BY CONSTRUCTION, so it
    // broadcasts and the corpus side never shuffles for the fetch
    val nvs = e.select(col("vec_id").as("neighbor_id"), col("v").as("nv"))
    val l2 = VectorOps.dot(col("qv"), col("qv")) -
      lit(2.0) * VectorOps.dot(col("qv"), col("nv")) +
      VectorOps.dot(col("nv"), col("nv"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("l2"), col("neighbor_id"))
    nvs
      .join(broadcast(shortlist), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), l2.as("l2"))
      .withColumn("rn", row_number().over(wRank).cast(LongType))
      .where(col("rn") <= K)
  }

  /** q59 — array-function surface over the embedding column: size,
    * order-independent extrema (exact on floats), and an
    * order-controlled sum via dot-with-ones (strict left fold on both
    * engines — a groupless `list_sum` would have engine-defined order). */
  def arrayOps(s: SparkSession, dir: String): DataFrame = {
    val ones = array(Seq.fill(VectorOps.Dim)(lit(1.0)): _*)
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        size(col("embedding")).cast(LongType).as("n"),
        array_max(col("embedding")).cast("double").as("vmax"),
        array_min(col("embedding")).cast("double").as("vmin"),
        VectorOps.dot(VectorOps.toDoubleArr(col("embedding")), ones).as("vsum"))
      .orderBy(col("vec_id"))
  }

  // q101 duplicate bar: within-cell pairs at/above this cosine are
  // semantic duplicates (matches q30's near-dup bar — the populated
  // regime of the synthetic embeddings).
  private val SemTau = 0.4

  /** q101 — SemDeDup pruning (Abbas et al. 2023, arXiv:2303.09540):
    * cluster the corpus with the frozen IVF codebook, then inside each
    * cluster mark every vector that has a MORE CENTRAL near-duplicate
    * (cosine ≥ τ, "more central" = smaller L2 to the cell centroid,
    * ties by vec_id) as dropped — one representative per semantic
    * ε-ball survives, and it is the most central one (the paper's
    * deterministic variant of its keep-one rule).
    *
    * This is the missing policy half of q30/q77: q30 LISTS near-dup
    * pairs, q77 caps cluster sizes by a quota regardless of duplication;
    * q101 emits the per-vector keep/drop VERDICT a curation pipeline
    * acts on. Scale shape: assignment is rows × 32 broadcast centroids
    * (no shuffle beyond the per-vector argmin window); the pair stage is
    * a cell-equality hash join, cost Σ_cell |cell|² — never all-pairs.
    * The cluster count is the scale dial: SemDeDup runs k ∝ √N (50k
    * clusters for LAION-440M), holding E|cell| — and so the per-key
    * join fan-out — constant as the corpus grows.
    *
    * The dial is config, though, and a frozen codebook under a grown
    * corpus would quietly turn Σ|cell|² quadratic — so the pair stage
    * is GATED (q30's measure-then-branch): at/below
    * [[SemDedupGateRows]] the exact within-cell join runs (every sf the
    * oracle checks); above it, pairs must ALSO share a [[LshBits]]-bit
    * sign sub-bucket (q52's family), dividing per-key fan-out by the
    * occupied sub-bucket count regardless of |cell|. The fallback's
    * error is one-sided: it examines a SUBSET of the exact pairs, so
    * every vector it drops is dominated in the exact semantics too —
    * it can only under-drop (keep extra), never discard a non-duplicate
    * (SemDedupSpec asserts this soundness on the forced scale path).
    */
  def semDedupPrune(s: SparkSession, dir: String): DataFrame =
    graft.Gate.byCount(Tables.embeddings(s, dir), SemDedupGateRows)(
      semDedupPruneImpl(s, dir, subBucketed = false))(
      semDedupPruneImpl(s, dir, subBucketed = true))

  private[queries] val SemDedupGateRows = 100000L

  private[queries] def semDedupPruneImpl(
      s: SparkSession, dir: String, subBucketed: Boolean): DataFrame = {
    val e0 = vecs(s, dir)
    val e = if (subBucketed)
      e0.withColumn("sub", VectorOps.signBucket(col("embedding"), LshBits))
    else e0.withColumn("sub", lit(0L))
    val book = graft.llm.CurationSnapshot.centroids(s, dir)
    val cents = centroids(s, dir).withColumn("cnrm", VectorOps.norm(col("cv")))
    val dist = col("nrm") * col("nrm") -
      lit(2.0) * VectorOps.dot(col("v"), col("cv")) + col("cnrm") * col("cnrm")
    // row-local native argmin (q77's rationale); dist recomputed for
    // the assigned cell only via the broadcast 32-row centroid relation
    val assigned = e
      .withColumn("cell", graft.llm.ServeBooks.cell(book, col("v")))
      .join(broadcast(cents), col("cell") === col("cid"))
      .select(col("vec_id"), col("v"), col("nrm"), col("sub"),
        col("cell"), dist.as("dist"))
    val a = assigned.select(col("cell").as("cell_a"), col("sub").as("sub_a"),
      col("vec_id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"), col("dist").as("da"))
    val b = assigned.select(col("cell").as("cell_b"), col("sub").as("sub_b"),
      col("vec_id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"), col("dist").as("db"))
    val cos = VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb"))
    // a strictly more central than b (ties by id) and near-duplicate of
    // it; `sub` is constant 0 on the exact path, so the equality key
    // degenerates to the plain cell join there
    val dominated = a.join(b,
        col("cell_a") === col("cell_b") && col("sub_a") === col("sub_b") &&
        (col("da") < col("db") ||
          (col("da") === col("db") && col("id_a") < col("id_b"))))
      .where(cos >= SemTau)
      .select(col("id_b").as("vec_id")).distinct()
    assigned.select(col("vec_id"), col("cell"))
      .join(dominated.withColumn("dropped", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        col("dropped").isNull.as("kept"))
      .orderBy(col("vec_id"))
  }

  /** q102 — one distributed Lloyd iteration (the k-means UPDATE step
    * over the frozen coarse codebook): assign every vector to its
    * nearest centroid, then emit each cell's member count and new mean
    * vector. This is how the IVF/PQ codebooks themselves get trained at
    * corpus scale (graft.llm.PqTrain iterates it distributed;
    * ServeBooks publishes the result), and the canonical shape of
    * EM-style iterative fitting on Spark.
    *
    * Scale shape: assignment is rows × 32 broadcast centroids; the
    * update is ONE partial-aggregated groupBy — each task combines its
    * rows map-side into ≤ cells rows of (count, 64 decimal sums), so
    * the shuffle is O(cells × dim × partitions) regardless of corpus
    * size, and no vector row ever crosses the wire. Element sums ride
    * DECIMAL(18,9) (exact, associative — float addition order would
    * diverge between engines and across partitionings; the dsum idiom
    * of RelationalQueries) and only the final mean division returns to
    * DOUBLE.
    *
    * Output shape: one scalar row per (cell, dim) — the 32×64 centroid
    * matrix in long form, not an array column. A nested column would be
    * opaque to any row-hash/diff harness (and to most warehouse diff
    * tooling); 2,048 flat rows cost nothing and stay comparable.
    */
  def centroidUpdate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val book = graft.llm.CurationSnapshot.centroids(s, dir)
    val e = vecs(s, dir)
    // assignment is fully row-local here — dist is never read
    // downstream, so no centroid relation is joined at all; the only
    // exchange left in the query is the partial-aggregated groupBy
    val assigned = e.select(col("v"),
      graft.llm.ServeBooks.cell(book, col("v")).as("cell"))
    // element sums ride floor(x·10⁹) longs, NOT a double→DECIMAL cast:
    // raw float32 components are dyadic rationals that land on EXACT
    // decimal midpoints (0.1494140625 at sf0.1), where Spark's decimal
    // cast rounds HALF_UP and DuckDB's half-to-even — q116's floor
    // quantization is unambiguous on both engines (r10 sf0.1 triage)
    val sums = (0 until VectorOps.Dim).map(i =>
      sum(floor(col("v").getItem(i) * lit(1e9)).cast(LongType)).as(s"s$i"))
    assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"), sums: _*)
      .select(col("cell"), col("n_members"),
        posexplode(array((0 until VectorOps.Dim).map(i =>
          col(s"s$i").cast(DoubleType) / lit(1e9) / col("n_members")): _*))
          .as(Seq("d0", "mean")))
      .select(col("cell"), col("n_members"),
        (col("d0") + 1).cast(LongType).as("dim"), col("mean"))
      .orderBy(col("cell"), col("dim"))
  }

  // ADC shortlist depth for q113 (same dial as q64's PqShortlist —
  // int8 quantization noise is far smaller than PQ's, so the same
  // depth holds recall with margin; measured recall@5 in AnnRecallSpec).
  private val Int8Shortlist = 50

  /** q113 — IVF ANN with an int8 asymmetric-distance candidate stage:
    * q64's two-level shape (coarse IVF probe → quantized-distance
    * shortlist → exact re-rank) with q106's scalar quantization as the
    * fine level instead of PQ. Candidates are ranked by
    * L2²(exact query, dequantized int8 reconstruction) — the
    * asymmetric distance of Jégou et al. 2011 — so the candidate stage
    * needs only a vector's 64 int8 codes plus the global 64-row scale
    * table: 4× smaller than float32 (PQ's 8 B/vector is 32×, but int8
    * reconstructs with ~16× less squared error on this corpus, which
    * is the classic memory/recall rung between raw floats and PQ).
    *
    * The scale table (per-dim min/max — q106's exact aggregate) and
    * the encoded corpus are both ArtifactStore-published
    * (ServeBooks.int8Scales/int8Codes — q164's precomputed-index
    * topology): serving reads stored (cell, codes) attributes and
    * dequantizes through the native graft_int8_decode expression, the
    * scale table riding the plan as a spec literal. Codes are exact
    * integers (floor over bit-identical IEEE doubles) and every
    * dequant/distance expression mirrors the DuckDB oracle tree, so
    * the whole two-stage pipeline is exact-oracle-able end to end —
    * the oracle re-derives the encoding from the corpus, independently
    * verifying the stored index.
    *
    * Scale shape: candidate join bounded by probed cells, per-query
    * shortlist-50 window, exact re-rank fetches raw vectors via a
    * bounded-shortlist broadcast — the corpus never shuffles.
    */
  def knnIvfInt8(s: SparkSession, dir: String): DataFrame =
    knnIvfInt8Core(s, dir).orderBy(col("query_id"), col("rn"))

  /** q113's plan minus the presentation sort (the [[annTopk]] shape). */
  private[queries] def knnIvfInt8Core(s: SparkSession, dir: String): DataFrame = {
    import graft.llm.ServeBooks
    val e = vecsServed(s, dir)
    val book = ServeBooks.coarse(s, dir)
    // q164's precomputed-index topology applied to the int8 arm: the
    // corpus's (cell, 64 int8 codes) rows are an artifact
    // (ServeBooks.int8Codes), and dequantization is ONE native
    // expression carrying the q106 scale table as a plan-literal spec
    // — same bits as the old inline per-element arithmetic (single
    // IEEE ops in the same order), so the oracle is unchanged
    val (mns, mxs) = ServeBooks.int8Scales(s, dir)
    val spec = graft.functions.Int8DecodeTable.toSpec(mns, mxs)
    val cells = ServeBooks.int8Codes(s, dir)
      .select(col("vec_id"), col("cell"),
        call_function("graft_int8_decode", col("codes"), lit(spec))
          .as("xhat"))
    val probes = e.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(graft.llm.ServeBooks.probeCells(book, IvfProbes, col("v")))
          .as("probe"))
    val adc = VectorOps.dot(col("qv"), col("qv")) -
      lit(2.0) * VectorOps.dot(col("qv"), col("xhat")) +
      VectorOps.dot(col("xhat"), col("xhat"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("neighbor_id"))
    val shortlist = probes
      .join(cells, col("probe") === col("cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("vec_id").as("neighbor_id"),
        adc.as("adc"))
      .withColumn("rs", row_number().over(wAdc))
      .where(col("rs") <= Int8Shortlist)
    // bounded-shortlist broadcast fetch of raw vectors (q164's shape)
    val nvs = e.select(col("vec_id").as("neighbor_id"), col("v").as("nv"))
    val l2 = VectorOps.dot(col("qv"), col("qv")) -
      lit(2.0) * VectorOps.dot(col("qv"), col("nv")) +
      VectorOps.dot(col("nv"), col("nv"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("l2"), col("neighbor_id"))
    nvs
      .join(broadcast(shortlist), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), l2.as("l2"))
      .withColumn("rn", row_number().over(wRank).cast(LongType))
      .where(col("rn") <= K)
  }

  // ---------------------------------------------------------------- q106

  /** q106 — int8 scalar quantization of the embedding column (the
    * memory-side half of every large ANN deployment: 4× smaller than
    * float32, distance computed on codes). Per-dimension affine
    * quantization: code = ⌊(x − min_d) · 255 / (max_d − min_d)⌋ clamped
    * to [0, 255], dequantized at bucket centers (code + 0.5). Emits the
    * 20 vectors with the worst reconstruction error — the audit a
    * quantization rollout runs to find outlier vectors that need
    * re-scaling or exclusion.
    *
    * Everything compared across engines is integer: codes are exact
    * (floor over bit-identical IEEE doubles), and the reconstruction
    * error rides as Σ ⌊err²·10⁹⌋ BIGINT — no float sum ever crosses an
    * engine boundary, so no decimal-rounding or summation-order drift
    * is possible.
    *
    * Scale shape: posexplode fans each vector into 64 (dim, x) rows
    * that stay in their input partition; the per-dim min/max agg
    * shuffles only partitions × 64 partially-aggregated rows (64 hot
    * keys made safe by map-side combine); the 64-row scale table
    * broadcasts back; the per-vector rollup partial-aggregates to ~1
    * row per vector before its shuffle; the final cut is
    * TakeOrdered-20. No raw vector ever crosses the wire.
    */
  def int8Quantize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "xf")))
      .select(col("vec_id"), (col("i") + 1).cast(LongType).as("i"),
        col("xf").cast(DoubleType).as("x"))
    val dims = e.groupBy(col("i"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val code = when(col("mx") === col("mn"), lit(0L))
      .otherwise(least(lit(255L), greatest(lit(0L),
        floor(((col("x") - col("mn")) * lit(255.0)) / (col("mx") - col("mn"))))))
    val deq = col("mn") +
      ((col("code") + lit(0.5)) * (col("mx") - col("mn"))) / lit(255.0)
    val err = col("x") - deq
    e.join(broadcast(dims), Seq("i"))
      .withColumn("code", code)
      .select(col("vec_id"), col("code"),
        floor(err * err * lit(1000000000.0)).as("e9"))
      .groupBy(col("vec_id"))
      .agg(sum(col("code")).as("code_sum"), sum(col("e9")).as("ssq_scaled"))
      .orderBy(col("ssq_scaled").desc, col("vec_id")).limit(20)
  }

  // ---------------------------------------------------------------- q116

  /** q116 — the embedding covariance matrix in ONE distributed pass:
    * the Σ x xᵀ / Σ x sufficient statistics behind PCA, whitening, and
    * drift monitoring of an embedding space. Emits the upper triangle
    * (i ≤ j) as (i, j, n, cov_num) where cov_num = n·Σxᵢxⱼ − Σxᵢ·Σxⱼ,
    * the covariance numerator over values quantized to milli-units
    * (x_q = ⌊x·10³⌋); cov = cov_num / (n²·10⁶). The driver-side
    * eigendecomposition of a 64×64 matrix is trivial — the distributed
    * problem is ONLY these sums, so that is all this query computes.
    *
    * Integer-exact across engines (q106's convention): the quantized
    * values are exact floors of bit-identical IEEE doubles, every sum
    * is BIGINT, no float crosses engines. The quantum is the precision
    * dial; the BIGINT headroom (|x_q| ≤ 4·10³ ⇒ Σxᵢxⱼ overflows past
    * ~5·10¹¹ rows) is the scale bound, past which the sums ride
    * DECIMAL(38,0) — same plan, wider accumulator.
    *
    * Scale shape: the D² fan-out is entirely map-side — two nested
    * posexplodes stay in their input partition and partial-aggregate
    * to ≤ D(D+1)/2 rows per partition BEFORE the shuffle, so the
    * exchange carries partitions × 2,080 rows of 4 BIGINTs regardless
    * of corpus size. No self-join: the pair (i, j) is formed inside a
    * row, never by matching vectors across rows.
    */
  def embedCovariance(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val q = transform(col("embedding"),
      f => floor(f.cast(DoubleType) * lit(1000.0)).cast(LongType))
    val ei = Tables.embeddings(s, dir)
      .select(col("vec_id"), q.as("q"))
      .select(col("vec_id"), col("q"), posexplode(col("q")).as(Seq("i", "xi")))
    val eij = ei
      .select(col("i"), col("xi"), posexplode(col("q")).as(Seq("j", "xj")))
      .where(col("j") >= col("i"))
    eij.groupBy(col("i").cast(LongType).as("i"), col("j").cast(LongType).as("j"))
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("si"),
        sum(col("xj")).as("sj"), sum(col("xi") * col("xj")).as("qij"))
      .select(col("i"), col("j"), col("n"),
        (col("n") * col("qij") - col("si") * col("sj")).as("cov_num"))
      .orderBy(col("i"), col("j"))
  }

  /** Power-iteration depth and fixed-point scale for q150 — fixed
    * rounds (q125/q132/q149's determinism discipline) so the partial
    * iteration is oracle-able as unrolled CTEs; 8 rounds separates the
    * top eigenvector to the 1e-6 quantum on any spectrum with a
    * non-trivial gap. */
  private val PowerRounds = 8
  private val PowerScale = 1000000L

  /** q150 — the PCA top principal direction by POWER ITERATION over
    * q116's covariance, entirely in integers: v₀ = 𝟙·S, then
    * [[PowerRounds]] rounds of w = C·v followed by max-norm rescale
    * v' = sign(w)·(|w|·S div max|w|), S = [[PowerScale]]. Emits one row
    * per dimension: (dim, v) with v the fixed-point component in
    * [−S, S] (max-normalized, so some |v| = S exactly). This is the
    * direction a whitening/drift monitor projects onto first — and the
    * iterative-linear-algebra pattern (matmul as join+agg) that PCA,
    * PageRank (q91), and spectral methods share.
    *
    * Cross-engine exactness: every multiply/add is integer (DECIMAL(38)
    * here, HUGEINT in the oracle); the one division per round is made
    * unambiguous by taking |w| first — integer division of NON-NEGATIVE
    * operands is floor = truncate in both engines, where signed `div`
    * semantics could diverge. The all-zero-spectrum degenerate case
    * (max|w| = 0, e.g. constant embeddings) divides by nullif(·, 0) on
    * BOTH sides, so the engines agree on NULL components instead of one
    * erroring while the other nulls silently (ADVICE r7). Magnitude bound: |C·v| ≤ D·max|c|·S
    * ≈ 4·10²² at sf0.1 — inside DECIMAL(38,0) and HUGEINT, far outside
    * BIGINT, which is why the accumulators are wide.
    *
    * Scale shape: the ONLY corpus-sized work is q116's one-pass
    * covariance (map-side D² fan-out, ≤2,080 rows/partition to the
    * exchange), localCheckpoint-pinned so the scan runs once; the
    * iteration then joins a D×D frame (≤4,096 rows) with a D-row
    * vector 8 times — driver-scale linear algebra expressed as plans,
    * with per-round checkpoint lineage truncation.
    */
  def pcaPower(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // The dim² = 4,096 covariance cells are MODEL STATE — their size
    // depends on the embedding dimension, never on corpus rows — so
    // the corpus-scan derivation stays distributed (embedCovariance's
    // one pass) and the 8 max-norm power rounds over the matrix run
    // driver-side in exact BigInteger arithmetic: the SAME integer ops
    // the per-round SQL jobs computed (products, sums, abs-max,
    // truncating div against nullif(m, 0)), bit-identical by
    // exactness, minus ~16 scheduler round-trips over a 4 KiB matrix
    // (min 2.0 s → 0.7 s at sf0.1).
    val upper = embedCovariance(s, dir)
      .select(col("i"), col("j"), col("cov_num"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, BigInt(r.getLong(2))))
    val dims = upper.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val c = scala.collection.mutable.HashMap.empty[(Int, Int), BigInt]
    upper.foreach { case (i, j, x) => c((i, j)) = x; if (i != j) c((j, i)) = x }
    var v: Map[Int, Option[BigInt]] =
      dims.map(_ -> Option(BigInt(PowerScale))).toMap
    for (_ <- 1 to PowerRounds) {
      val w: Map[Int, Option[BigInt]] = dims.map { i =>
        val terms = dims.flatMap(j => c.get((i, j)).flatMap(cc => v(j).map(cc * _)))
        i -> (if (terms.isEmpty) None else Option(terms.sum))
      }.toMap
      val mags = w.values.flatten.map(_.abs)
      // nullif(m, 0): an all-zero matrix nulls every dim at once, and
      // null propagates through later rounds exactly as in SQL
      val mOk = (if (mags.isEmpty) None else Option(mags.max)).filter(_ != 0)
      v = dims.map { i =>
        i -> (for { wi <- w(i); mm <- mOk } yield
          (if (wi < 0) BigInt(-1) else BigInt(1)) * ((wi.abs * PowerScale) / mm))
      }.toMap
    }
    dims.map(i => (i.toLong, v(i).map(_.toLong))).toSeq
      .toDF("dim", "v")
      .orderBy(col("dim"))
  }

  /** Representatives per label for q155's cohesion audit. */
  private val RepK = 8

  /** q155 — embedding-space label-cohesion audit: for every label pair
    * (a ≤ b), the exact pair count and DECIMAL-stable cosine sum over
    * hash-sampled representatives — the separation diagnostic an
    * embedding rollout reads (intra-label mass on the diagonal,
    * inter-label mass off it; mean = cos_sum / n_pairs is the
    * consumer's division). Representatives are the bottom-[[RepK]]
    * vec_ids per label by salted 60-bit hash — q152's deterministic
    * sampling idiom riding the native `graft_topk` heap, so the sample
    * is a function of the data, not of partitioning, and the audit is
    * exact-oracle-able.
    *
    * Scale shape: one corpus pass partial-aggregates the ≤ |labels|·k
    * representative ids (bounded heap buffers on the wire); vectors are
    * fetched by a broadcast semi-join of that id set; the pair fan-out
    * is over the ≤ 80-row representative frame (an eval frame, never
    * the corpus — the documented bounded-crossJoin class). Per-pair
    * cosines go through DECIMAL(18,9) before summing (q86's
    * order-independence discipline).
    */
  def labelCohesion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val e = Tables.embeddings(s, dir)
    val pri = call_function("graft_h60",
      concat(lit("lrep|"), col("vec_id").cast(StringType)))
    val repIds = e
      .select(col("label"), (-pri).as("negp"),
        lpad(col("vec_id").cast(StringType), 20, "0").as("tag"))
      .groupBy(col("label"))
      .agg(call_function("graft_topk", col("negp"), col("tag"), lit(RepK))
        .as("tk"))
      .select(col("label"), explode(col("tk")).as("e"))
      .select(col("label"), col("e.tag").cast(LongType).as("vec_id"))
    val reps = e.select(col("vec_id"),
        VectorOps.toDoubleArr(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
      .join(broadcast(repIds.select(col("vec_id"), col("label"))), "vec_id")
      .localCheckpoint()
    val a = reps.select(col("label").as("la"), col("vec_id").as("ia"),
      col("v").as("va"), col("nrm").as("na"))
    val b = reps.select(col("label").as("lb"), col("vec_id").as("ib"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("la") < col("lb") ||
        (col("la") === col("lb") && col("ia") < col("ib")))
      .select(col("la").cast(LongType).as("label_a"),
        col("lb").cast(LongType).as("label_b"),
        (VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .cast("decimal(18,9)").as("ts"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("ts")).cast("double").as("cos_sum"))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** q129 — the ANN rollout gate as a QUERY: recall@K of the IVF index
    * (q55) against exact brute truth (q31), per query — hits =
    * |IVF top-K ∩ brute top-K|; corpus recall is Σhits / (Q·K), the
    * consumer's division. The specs have always asserted recall BARS;
    * registering the audit makes the eval itself oracle-checked — both
    * engines must agree on every per-query hit count, so the oracle
    * proves the two arms AND the intersection logic simultaneously.
    *
    * Scale shape: both arms' plans are q31/q55's (documented there);
    * the intersection is an equi-join of two Q×K-row frames — eval
    * frames, not corpus frames.
    */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val b = knnBrute(s, dir).select(col("query_id"), col("neighbor_id"))
    val i = annTopkIvf(s, dir).select(col("query_id"), col("neighbor_id"),
      lit(1L).as("hit"))
    b.join(i, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
        first(lit(K.toLong)).as("k"))
      .orderBy(col("query_id"))
  }

  /** Dimension prefix for q134's truncation audit. */
  private val PrefixDims = 16

  /** q134 — embedding-truncation (Matryoshka-style) recall audit: how
    * much ANN quality survives keeping only the first [[PrefixDims]] of
    * 64 dimensions? Per query, |full-dim brute top-K ∩ prefix-dim brute
    * top-K| — the number a deployment reads before switching its
    * candidate stage to truncated vectors (4× memory/bandwidth cut,
    * the float-precision sibling of q113's int8 move). q129's audit
    * shape: both arms are the LITERAL q31 pipeline (one over sliced
    * vectors), so the oracle proves arms and intersection at once.
    *
    * Scale shape: both arms are the documented brute baseline over the
    * bounded query set (QuerySetSize × corpus row-local dot products,
    * partial top-K per query); the production path would swap the
    * prefix arm's scan into q55's IVF — the audit's cost model is
    * q31's, deliberately.
    */
  def prefixRecall(s: SparkSession, dir: String): DataFrame = {
    val ep = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        slice(VectorOps.toDoubleArr(col("embedding")), 1, PrefixDims).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
    val qp = ep.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val cos = VectorOps.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    // same graft_topk bounded-heap form as q31's arm (both arms of the
    // audit are brute — neither may pay the Q×N window sort)
    val prefixTop = qp.crossJoin(ep).where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .groupBy(col("query_id"))
      .agg(call_function("graft_topk",
        call_function("graft_dsort", col("cos")),
        lpad(col("neighbor_id").cast("string"), 20, "0"), lit(K))
        .as("tk"))
      .select(col("query_id"), explode(col("tk")).as("e"))
      .select(col("query_id"), col("e.tag").cast(LongType).as("neighbor_id"),
        lit(1L).as("hit"))
    knnBrute(s, dir).select(col("query_id"), col("neighbor_id"))
      .join(prefixTop, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
        first(lit(K.toLong)).as("k"),
        first(lit(PrefixDims.toLong)).as("dims"))
      .orderBy(col("query_id"))
  }

  /** q158 — IVF index-health audit over the SERVE artifact: per
    * trained cell, the member count and the DECIMAL-stable sum of
    * exact L2² assignment distances (mean = dist_sum / n_members is
    * the consumer's division). This is the dashboard an ANN rollout
    * watches: dead cells (n_members = 0 — wasted probe budget),
    * oversized cells (candidate-stage hotspots), and rising mean
    * distance (the corpus drifting away from the codebook — the
    * retrain trigger). Every cell appears, INCLUDING empty ones: a
    * health audit blind to dead cells reads "healthy" exactly when
    * the index is degenerate.
    *
    * Scale shape: assignment is the row-local literal-argmin of the
    * serve path (no join, no window); the exact distance is
    * dot(v,v) + min-score (the argmin's own value, no recompute);
    * ONE partial agg into ≤32 rows; the dense cell frame is a 32-row
    * broadcast left join.
    */
  def ivfHealth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.llm.ServeBooks
    val book = ServeBooks.coarse(s, dir)
    val e = vecs(s, dir)
    val assigned = e.select(
        ServeBooks.cell(book, col("v")).as("cid"),
        (VectorOps.dot(col("v"), col("v")) +
          ServeBooks.minScore(book, col("v"))).as("dist"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("dist").cast("decimal(18,9)")).as("ds"))
    val frame = book.indices.map(_.toLong).toDF("cid")
    broadcast(frame).join(assigned, Seq("cid"), "left")
      .select(col("cid"), coalesce(col("n_members"), lit(0L)).as("n_members"),
        coalesce(col("ds"), lit(java.math.BigDecimal.ZERO)
          .cast("decimal(18,9)")).cast("double").as("dist_sum"))
      .orderBy(col("cid"))
  }

  /** q159 — codebook-drift audit: per cell, the scaled L2² distance
    * between the PINNED snapshot (graft.llm.CurationSnapshot — what
    * the curation queries and stream-start state are pinned to)
    * and the freshly TRAINED serve book (the ServeBooks artifact) —
    * the "how far has the corpus moved since the deployed snapshot"
    * number that decides when the pinned consumers re-freeze. Integer
    * end to end (q116's convention): each squared component is
    * floored at the 10¹² quantum from bit-identical doubles, so no
    * float sum crosses engines.
    *
    * Scale shape: corpus-free — 32×64 artifact rows join a 2,048-row
    * literal frame; the only scan is the tiny codebook parquet.
    */
  def codebookDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.llm.ServeBooks
    val trained = ServeBooks.coarseFrame(s, dir)
    val ref = graft.llm.CurationSnapshot.frame(s, dir)
      .select(col("cid"), col("dim"), col("cval").as("rval"))
    trained.join(broadcast(ref), Seq("cid", "dim"))
      .select(col("cid"),
        floor((col("rval") - col("cval")) * (col("rval") - col("cval"))
          * lit(1000000000000.0)).cast(LongType).as("d2"))
      .groupBy(col("cid"))
      .agg(sum(col("d2")).as("drift_scaled"), count(lit(1)).as("n_dims"))
      .orderBy(col("cid"))
  }

  /** Probe budgets for q161's recall curve — the q55 dial swept. */
  private val ProbeBudgets = Seq(1L, 2L, 4L, 8L, 16L, 32L)

  /** q161 — the IVF probe-budget RECALL CURVE: recall@K of the q55
    * index against brute truth at every probe budget in
    * [[ProbeBudgets]], in one query — the tuning artifact behind
    * q55's "8 probes" dial (q142 is the same artifact for the LSH
    * bands). Emits (n_probes, hits, denom): corpus recall at budget p
    * is hits/denom, the consumer's division. Because a vector lives in
    * exactly one cell, its admission rank is the rank of that cell in
    * the query's probe order, so ONE assignment pass serves every
    * budget — the curve costs one candidate enumeration plus six
    * bounded re-ranks, not six index runs.
    *
    * Scale shape: assignment and probe ranks are the serve path's
    * row-local expressions; the admitted-candidate frame is the q55
    * join at its widest budget; each budget re-ranks a filter of that
    * frame inside per-(budget, query) windows (bounded query set), and
    * the brute arm is q31's documented gated baseline.
    */
  def probeCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.llm.ServeBooks
    val book = ServeBooks.coarse(s, dir)
    val e = vecs(s, dir)
    val cells = e.select(col("vec_id"), col("v"), col("nrm"),
      ServeBooks.cell(book, col("v")).as("cell"))
    val probes = e.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"),
        posexplode(ServeBooks.probeCells(book, ServeBooks.CoarseCells,
          col("v"))).as(Seq("p0", "probe")))
      .select(col("query_id"), col("qv"), col("qnrm"),
        (col("p0") + 1).cast(LongType).as("arank"), col("probe"))
    val cos = VectorOps.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    val adm = probes.join(cells,
        col("probe") === col("cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cos.as("cos"), col("arank"))
    val budgets = ProbeBudgets.toDF("n_probes")
    val w = Window.partitionBy(col("n_probes"), col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val ivfTop = adm.crossJoin(broadcast(budgets))
      .where(col("arank") <= col("n_probes"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= K)
      .select(col("n_probes"), col("query_id"), col("neighbor_id"),
        lit(1L).as("hit"))
    val brute = knnBrute(s, dir).select(col("query_id"), col("neighbor_id"))
      .crossJoin(broadcast(budgets))
    brute.join(ivfTop, Seq("n_probes", "query_id", "neighbor_id"), "left")
      .groupBy(col("n_probes"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
        count(lit(1)).as("denom"))
      .orderBy(col("n_probes"))
  }

  /** Exact-L2 brute top-K — the ground truth the ADC paths rank
    * against — as a persistent corpus artifact (round 17): the truth
    * set is a pure function of the embeddings corpus and FOUR audits
    * consume it (q162/q163/q165, q168 twice — once per arm branch),
    * so the Q×corpus brute scan ran five times per suite pass for an
    * identical 5,000-row answer. The brute_pair_stats_v1 discipline
    * applied to the vector side: scan once per corpus, serve
    * FileScans. Corpus-fingerprint keyed; oracles recompute the truth
    * in SQL from the corpus, unchanged (the documentsArtifact rule).
    * Honest A/B at sf0.1: per-query solo mins are UNCHANGED within
    * noise (~1.0/1.0/0.9/1.5 s — the audits' cost is their serve
    * arms' stage latency, not the heap scan); what the store buys is
    * the corpus-scale posture (at 100 TB the truth arm is days of
    * compute — it must be derived state, never a per-audit rerun) and
    * five fewer corpus scans per suite pass. */
  private def knnBruteL2(s: SparkSession, dir: String): DataFrame =
    graft.ArtifactStore.parquetOnce(s, "brute_l2_topk_v1",
      graft.ArtifactStore.embeddingsFp(s, dir))(knnBruteL2Direct(s, dir))
      .drop("fp")

  /** The from-scratch truth scan (the artifact's build thunk): q31's
    * rationale — the `graft_topk` bounded heap; ascending L2 maps onto
    * the heap's descending score by negating the `graft_dsort`
    * encoding (safe: no real double encodes to Long.MinValue). Only
    * the admitted (query_id, neighbor_id) set is read by the audits,
    * so no decode stage is needed. */
  private def knnBruteL2Direct(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), VectorOps.toDoubleArr(col("embedding")).as("v"))
    val q = e.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val l2 = VectorOps.dot(col("qv"), col("qv")) -
      lit(2.0) * VectorOps.dot(col("qv"), col("v")) +
      VectorOps.dot(col("v"), col("v"))
    q.crossJoin(e).where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), l2.as("l2"))
      .groupBy(col("query_id"))
      .agg(call_function("graft_topk",
        -call_function("graft_dsort", col("l2")),
        lpad(col("neighbor_id").cast("string"), 20, "0"), lit(K))
        .as("tk"))
      .select(col("query_id"), explode(col("tk")).as("e"))
      .select(col("query_id"), col("e.tag").cast(LongType).as("neighbor_id"))
  }

  /** q162 — the IVF-PQ rollout gate as a QUERY (q129's audit shape for
    * the ADC arm): per query, |q64 top-K ∩ exact-L2 top-K|. Registers
    * what AnnRecallSpec asserts as a bar — both engines must agree on
    * every per-query hit count, proving the PQ arm, the L2 truth arm,
    * and the intersection at once. Scale shape: q64's documented plan
    * plus the bounded brute arm and a Q×K equi-join. */
  /** The four ANN arms' top-K lists over the fixed query set, served as
    * generation-managed artifacts (r17 second pass — brute_l2_topk_v1's
    * discipline applied to the approximate arms): each list is a pure
    * function of (corpus minus tombstones, trained books), both of which
    * are keyed by the embeddings fingerprint, so the stores key the same
    * way and are invalidated in the SAME takedown cascade as the books
    * ([[graft.sources.VecTakedown.embArtifactKeys]]) — a flag/reset
    * kills the stored lists with the model state they derive from, and
    * the next audit rebuilds from the filtered corpus with retrained
    * books, preserving the serve arms' immediate-exclusion semantics.
    * Consumers are the AUDITS ONLY (q129/q162/q163/q165/q168, which
    * formerly re-ran 6 arm pipelines per suite pass); the serve queries
    * q55/q64/q113/q164 still compute their pipelines per run — they ARE
    * the serve paths the audits grade. The DuckDB oracles recompute
    * every arm from the corpus, so the hash gate proves store ==
    * recomputation at every sf. */
  private[graft] val AnnTopkKeys: Seq[String] = Seq(
    "ann_topk_ivf_v1", "ann_topk_pq_v1", "ann_topk_res_v1",
    "ann_topk_int8_v1")

  private[queries] def annTopk(s: SparkSession, dir: String, key: String)
                     (core: => DataFrame): DataFrame =
    graft.ArtifactStore.parquetOnce(s, key,
      graft.ArtifactStore.embeddingsFp(s, dir))(
      core.select(col("query_id"), col("neighbor_id"), col("rn")))
      .drop("fp")

  private[queries] def annTopkIvf(s: SparkSession, dir: String): DataFrame =
    annTopk(s, dir, "ann_topk_ivf_v1")(knnIvfCore(s, dir))
  private[queries] def annTopkPq(s: SparkSession, dir: String): DataFrame =
    annTopk(s, dir, "ann_topk_pq_v1")(knnIvfPqCore(s, dir))
  private[queries] def annTopkRes(s: SparkSession, dir: String): DataFrame =
    annTopk(s, dir, "ann_topk_res_v1")(knnIvfPqResCore(s, dir))
  private[queries] def annTopkInt8(s: SparkSession, dir: String): DataFrame =
    annTopk(s, dir, "ann_topk_int8_v1")(knnIvfInt8Core(s, dir))

  def adcRecall(s: SparkSession, dir: String): DataFrame = {
    val b = knnBruteL2(s, dir).select(col("query_id"), col("neighbor_id"))
    val i = annTopkPq(s, dir).select(col("query_id"), col("neighbor_id"),
      lit(1L).as("hit"))
    b.join(i, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
        first(lit(K.toLong)).as("k"))
      .orderBy(col("query_id"))
  }

  /** q163 — q162 for the int8-ADC arm (q113). */
  def int8Recall(s: SparkSession, dir: String): DataFrame = {
    val b = knnBruteL2(s, dir).select(col("query_id"), col("neighbor_id"))
    val i = annTopkInt8(s, dir).select(col("query_id"), col("neighbor_id"),
      lit(1L).as("hit"))
    b.join(i, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
        first(lit(K.toLong)).as("k"))
      .orderBy(col("query_id"))
  }

  /** q165 — q162's rollout gate for the residual arm (q164): per-query
    * hits vs exact-L2 truth. Read beside q162 row-for-row, it is the
    * residual-encoding gain as an oracle-checked number. */
  def resRecall(s: SparkSession, dir: String): DataFrame = {
    val b = knnBruteL2(s, dir).select(col("query_id"), col("neighbor_id"))
    val i = annTopkRes(s, dir).select(col("query_id"), col("neighbor_id"),
      lit(1L).as("hit"))
    b.join(i, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"),
        first(lit(K.toLong)).as("k"))
      .orderBy(col("query_id"))
  }

  /** q168 — rank-WEIGHTED audit of the two ADC arms (q64 raw-PQ vs
    * q164 residual-PQ) against exact-L2 truth, in one output: recall
    * (q162/q165) counts hits anywhere in the top-K; this weights each
    * hit by the 1/rank discount (the DCG family's position credit), so
    * an arm that finds the right neighbors but SHUFFLES their order
    * scores lower. The discount rides exact integers — 60 div rank,
    * 60 = lcm(1..5), so per-query scores are integers in [0, 137] —
    * because log2-discounted DCG and floating 1/rank sums would both
    * hit the engines' 1-ULP ln/order-of-addition traps (q69's rule).
    * Scale shape: two bounded Q×K joins over the arms' documented
    * plans. */
  def adcRankAudit(s: SparkSession, dir: String): DataFrame = {
    // Per-arm joins against the (cheap, heap-ranked) truth arm. An
    // attempted one-pass variant — truth ×2 via a 2-row broadcast
    // crossJoin, one left join against the unioned arms — measured
    // SLOWER in isolation (1.61 s vs 1.36 s min; the union barrier
    // serializes the two serve pipelines, and the re-run heap scan
    // costs less than what the barrier loses), so the straightforward
    // shape stays.
    val b = knnBruteL2(s, dir).select(col("query_id"), col("neighbor_id"))
    def armOf(df: DataFrame, name: String): DataFrame =
      b.join(df.select(col("query_id"), col("neighbor_id"), col("rn")),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(expr("CAST(60 div rn AS BIGINT)"), lit(0L)))
          .as("rw60"),
          sum(when(col("rn").isNotNull, 1L).otherwise(0L)).as("hits"))
        .select(col("query_id"), lit(name).as("arm"), col("rw60"), col("hits"))
    armOf(annTopkPq(s, dir), "pq")
      .unionByName(armOf(annTopkRes(s, dir), "res"))
      .orderBy(col("arm"), col("query_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q164_knn_ivfpq_res" -> knnIvfPqRes,
    "q165_res_recall" -> resRecall,
    "q168_adc_rank_audit" -> adcRankAudit,
    "q134_prefix_recall" -> prefixRecall,
    "q106_int8_quantize" -> int8Quantize,
    "q116_embed_covariance" -> embedCovariance,
    "q150_pca_power" -> pcaPower,
    "q155_label_cohesion" -> labelCohesion,
    "q129_ann_recall" -> annRecall,
    "q101_semdedup_prune" -> semDedupPrune,
    "q102_centroid_update" -> centroidUpdate,
    "q30_embed_neardup" -> embedNearDup,
    "q31_knn_brute"     -> knnBrute,
    "q189_mmr_rerank"   -> mmrRerank,
    "q190_mmr_rerank_ivf" -> mmrRerankIvf,
    "q193_radius_search" -> radiusSearch,
    "q194_radius_search_ivf" -> radiusSearchIvf,
    "q198_radius_recall" -> radiusRecall,
    "q32_knn_lsh"       -> knnLsh,
    "q52_embed_neardup_lsh" -> embedNearDupLsh,
    "q55_knn_ivf"       -> knnIvf,
    "q181_knn_filtered" -> knnIvfFiltered,
    "q77_semantic_sample" -> semanticSample,
    "q59_array_ops"     -> arrayOps,
    "q64_knn_ivfpq"     -> knnIvfPq,
    "q113_knn_ivf_int8" -> knnIvfInt8,
    "q148_pq_train" -> ((s, dir) => graft.llm.PqTrain.pqTrainQuery(s, dir)),
    "q158_ivf_health" -> ivfHealth,
    "q159_codebook_drift" -> codebookDrift,
    "q161_probe_curve" -> probeCurve,
    "q162_adc_recall" -> adcRecall,
    "q163_int8_recall" -> int8Recall,
    "q154_ivf_train" -> ((s, dir) => graft.llm.IvfTrain.ivfTrainQuery(s, dir))
  )

  /** One power-iteration round as CTEs (the Spark loop's round,
    * verbatim: w = C·v as join+sum, then sign·(|w|·S div max|w|) —
    * operands non-negative so `//`'s floor equals `div`'s truncate). */
  private def powerIterCte(i: Int): String =
    s"""w$i AS MATERIALIZED (
       |  SELECT c.i AS dim, SUM(c.c * v.v) AS w
       |  FROM cov c JOIN v${i - 1} v ON v.dim = c.j
       |  GROUP BY c.i),
       |v$i AS MATERIALIZED (
       |  SELECT dim,
       |         (CASE WHEN w < 0 THEN -1 ELSE 1 END)
       |           * ((abs(w) * $PowerScale)
       |              // (SELECT nullif(MAX(abs(w)), 0) FROM w$i)) AS v
       |  FROM w$i)""".stripMargin

  /** q31's oracle body over any (vec_id, embedding) source — also the
    * brute arm of q129's recall audit and (sliced) of q134's. */
  private def bruteSqlOver(src: String): String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $nrmSql AS nrm FROM $src),
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm
       |  FROM e WHERE vec_id < $QuerySetSize),
       |c AS (
       |  SELECT query_id, e.vec_id AS neighbor_id, $qCosSql AS cos
       |  FROM q, e WHERE e.vec_id <> q.query_id),
       |r AS (
       |  SELECT query_id, neighbor_id, cos,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
       |  FROM c)
       |SELECT query_id, neighbor_id, cos, rn FROM r
       |WHERE rn <= $K ORDER BY query_id, rn""".stripMargin

  private lazy val knnBruteSql: String = bruteSqlOver("embeddings")

  /** q189's oracle: the SAME greedy MMR, unrolled — at plan-time-fixed
    * K the recursion is just [[MmrK]] chained CTE stages (selu/rem/ms/
    * sc/sel per step), generated here so the per-step expression
    * `0.7·rel − 0.3·COALESCE(msim, 0.0)` is literally the Spark tree.
    * Parameterized on the shortlist prefix (CTEs `e` and `short`) —
    * one oracle tail, two feeds, mirroring [[mmrOver]]. */
  private def mmrSqlOver(prefix: String): String = {
    val steps = (2 to MmrK).map { i =>
      val selU = (1 until i).map(j => s"SELECT * FROM sel$j")
        .mkString(" UNION ALL ")
      s"""selu$i AS ($selU),
         |rem$i AS (
         |  SELECT s.query_id, s.neighbor_id, s.rel FROM short s
         |  LEFT JOIN selu$i u
         |    ON s.query_id = u.query_id AND s.neighbor_id = u.neighbor_id
         |  WHERE u.neighbor_id IS NULL),
         |ms$i AS (
         |  SELECT sims.query_id, sims.ca AS neighbor_id,
         |         max(sims.sim) AS msim
         |  FROM sims JOIN selu$i u
         |    ON sims.query_id = u.query_id AND sims.cb = u.neighbor_id
         |  GROUP BY sims.query_id, sims.ca),
         |sc$i AS (
         |  SELECT r.query_id, r.neighbor_id, r.rel,
         |         0.7 * r.rel - 0.3 * COALESCE(m.msim, 0.0) AS mmr
         |  FROM rem$i r LEFT JOIN ms$i m
         |    ON r.query_id = m.query_id AND r.neighbor_id = m.neighbor_id),
         |sel$i AS (
         |  SELECT query_id, ${i}::BIGINT AS step, neighbor_id, rel, mmr
         |  FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY mmr DESC, neighbor_id) AS rk FROM sc$i)
         |  WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    val union = (1 to MmrK).map(j => s"SELECT * FROM sel$j")
      .mkString(" UNION ALL ")
    s"""WITH $prefix,
       |sims AS (
       |  SELECT a.query_id, a.neighbor_id AS ca, b.neighbor_id AS cb,
       |         list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm) AS sim
       |  FROM short a
       |  JOIN short b ON a.query_id = b.query_id
       |              AND a.neighbor_id <> b.neighbor_id
       |  JOIN e ea ON ea.vec_id = a.neighbor_id
       |  JOIN e eb ON eb.vec_id = b.neighbor_id),
       |sel1 AS (
       |  SELECT query_id, 1::BIGINT AS step, neighbor_id, rel,
       |         0.7 * rel - 0.3 * 0.0 AS mmr
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY 0.7 * rel - 0.3 * 0.0 DESC, neighbor_id) AS rk
       |    FROM short)
       |  WHERE rk = 1),
       |$steps
       |SELECT * FROM ($union) ORDER BY query_id, step""".stripMargin
  }

  /** q189's oracle: the brute relevance feed under the unrolled tail. */
  private lazy val mmrSql: String = mmrSqlOver(
    s"""e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v, $nrmSql AS nrm
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qnrm
       |  FROM e WHERE vec_id < $QuerySetSize),
       |sc AS (
       |  SELECT query_id, e.vec_id AS neighbor_id,
       |         list_dot_product(qv, e.v) / (qnrm * e.nrm) AS rel
       |  FROM q JOIN e ON e.vec_id <> query_id),
       |short AS (
       |  SELECT query_id, neighbor_id, rel FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id
       |      ORDER BY rel DESC, neighbor_id) AS rn FROM sc)
       |  WHERE rn <= $MmrShortK)""".stripMargin)

  /** q190's oracle: q55's probed-cell feed (tombstone-excluded, the
    * published book's cells) under the same unrolled tail. */
  private lazy val mmrIvfSql: String = {
    import graft.llm.ServeBooks
    mmrSqlOver(
      s"""e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v, $nrmSql AS nrm
         |  FROM embeddings
         |  WHERE ${graft.sources.VecTakedown.notTombstonedSql}),
         |${ServeBooks.coarseCentsCteSql},
         |${ServeBooks.assignRankCteSql},
         |cells AS (
         |  SELECT e.vec_id, e.v, e.nrm, r.cid AS cell
         |  FROM e JOIN r ON e.vec_id = r.vec_id AND r.rk = 1),
         |probes AS (
         |  SELECT e.vec_id AS query_id, e.v AS qv, e.nrm AS qnrm,
         |         r.cid AS probe
         |  FROM e JOIN r ON e.vec_id = r.vec_id
         |  WHERE r.rk <= $IvfProbes AND e.vec_id < $QuerySetSize),
         |sc AS (
         |  SELECT query_id, cells.vec_id AS neighbor_id,
         |         list_dot_product(qv, cells.v) / (qnrm * cells.nrm) AS rel
         |  FROM probes JOIN cells
         |    ON probe = cell AND cells.vec_id <> query_id),
         |short AS (
         |  SELECT query_id, neighbor_id, rel FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY rel DESC, neighbor_id) AS rn FROM sc)
         |  WHERE rn <= $MmrShortK)""".stripMargin)
  }

  /** q55's oracle body — also the ANN arm of q129's recall audit.
    * Centroids come from the ServeBooks-published artifact (the SAME
    * parquet the Spark side trained and serves from), selected by the
    * fingerprint this corpus hashes to in SQL. */
  private lazy val radiusSearchSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v, $nrmSql AS nrm
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qnrm
       |  FROM e WHERE vec_id < $QuerySetSize)
       |SELECT query_id, e.vec_id AS neighbor_id,
       |       list_dot_product(qv, e.v) / (qnrm * e.nrm) AS cos
       |FROM q, e
       |WHERE e.vec_id <> query_id
       |  AND list_dot_product(qv, e.v) / (qnrm * e.nrm) >= $RadiusTau
       |ORDER BY query_id, neighbor_id""".stripMargin

  private lazy val radiusSearchIvfSql: String = {
    import graft.llm.ServeBooks
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v, $nrmSql AS nrm
       |  FROM embeddings
       |  WHERE ${graft.sources.VecTakedown.notTombstonedSql}),
       |${ServeBooks.coarseCentsCteSql},
       |${ServeBooks.assignRankCteSql},
       |cells AS (
       |  SELECT e.vec_id, e.v, e.nrm, r.cid AS cell
       |  FROM e JOIN r ON e.vec_id = r.vec_id AND r.rk = 1),
       |probes AS (
       |  SELECT e.vec_id AS query_id, e.v AS qv, e.nrm AS qnrm, r.cid AS probe
       |  FROM e JOIN r ON e.vec_id = r.vec_id
       |  WHERE r.rk <= $IvfProbes AND e.vec_id < $QuerySetSize)
       |SELECT query_id, cells.vec_id AS neighbor_id,
       |       list_dot_product(qv, cells.v) / (qnrm * cells.nrm) AS cos
       |FROM probes JOIN cells ON probe = cell AND cells.vec_id <> query_id
       |WHERE list_dot_product(qv, cells.v) / (qnrm * cells.nrm) >= $RadiusTau
       |ORDER BY query_id, neighbor_id""".stripMargin
  }

  private lazy val radiusRecallSql: String = {
    import graft.llm.ServeBooks
    // `e` is the tombstone-filtered relation the assignment CTEs read
    // (q194's oracle verbatim); the exact arm reads the unfiltered
    // corpus (`eall`) exactly like q193's
    s"""WITH eall AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v, $nrmSql AS nrm
       |  FROM embeddings),
       |qall AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qnrm
       |  FROM eall WHERE vec_id < $QuerySetSize),
       |exact AS (
       |  SELECT query_id, eall.vec_id AS neighbor_id
       |  FROM qall, eall
       |  WHERE eall.vec_id <> query_id
       |    AND list_dot_product(qv, eall.v) / (qnrm * eall.nrm)
       |        >= $RadiusTau),
       |e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v, $nrmSql AS nrm
       |  FROM embeddings
       |  WHERE ${graft.sources.VecTakedown.notTombstonedSql}),
       |${ServeBooks.coarseCentsCteSql},
       |${ServeBooks.assignRankCteSql},
       |cells AS (
       |  SELECT e.vec_id, e.v, e.nrm, r.cid AS cell
       |  FROM e JOIN r ON e.vec_id = r.vec_id AND r.rk = 1),
       |probes AS (
       |  SELECT e.vec_id AS query_id, e.v AS qv, e.nrm AS qnrm,
       |         r.cid AS probe
       |  FROM e JOIN r ON e.vec_id = r.vec_id
       |  WHERE r.rk <= $IvfProbes AND e.vec_id < $QuerySetSize),
       |served AS (
       |  SELECT query_id, cells.vec_id AS neighbor_id
       |  FROM probes JOIN cells ON probe = cell AND cells.vec_id <> query_id
       |  WHERE list_dot_product(qv, cells.v) / (qnrm * cells.nrm)
       |        >= $RadiusTau)
       |SELECT x.query_id, count(*)::BIGINT AS ball,
       |       count(s.neighbor_id)::BIGINT AS hits,
       |       (count(s.neighbor_id) * 1000) // count(*) AS recall_milli
       |FROM exact x LEFT JOIN served s
       |  ON s.query_id = x.query_id AND s.neighbor_id = x.neighbor_id
       |GROUP BY x.query_id ORDER BY x.query_id""".stripMargin
  }

  private lazy val knnIvfSql: String = {
    import graft.llm.ServeBooks
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v, $nrmSql AS nrm
       |  FROM embeddings
       |  WHERE ${graft.sources.VecTakedown.notTombstonedSql}),
       |${ServeBooks.coarseCentsCteSql},
       |${ServeBooks.assignRankCteSql},
       |cells AS (
       |  SELECT e.vec_id, e.v, e.nrm, r.cid AS cell
       |  FROM e JOIN r ON e.vec_id = r.vec_id AND r.rk = 1),
       |probes AS (
       |  SELECT e.vec_id AS query_id, e.v AS qv, e.nrm AS qnrm, r.cid AS probe
       |  FROM e JOIN r ON e.vec_id = r.vec_id
       |  WHERE r.rk <= $IvfProbes AND e.vec_id < $QuerySetSize),
       |c2 AS (
       |  SELECT query_id, cells.vec_id AS neighbor_id,
       |         list_dot_product(qv, cells.v) / (qnrm * cells.nrm) AS cos
       |  FROM probes JOIN cells ON probe = cell AND cells.vec_id <> query_id),
       |rr AS (
       |  SELECT query_id, neighbor_id, cos,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
       |  FROM c2)
       |SELECT query_id, neighbor_id, cos, rn FROM rr
       |WHERE rn <= $K ORDER BY query_id, rn""".stripMargin
  }


  /** q181's oracle — q55's body with the label predicate fused into
    * the candidate join, over the same published book. */
  private lazy val knnIvfFilteredSql: String = {
    import graft.llm.ServeBooks
    s"""WITH e AS (
       |  SELECT vec_id, label::BIGINT AS label,
       |         embedding::DOUBLE[] AS v, $nrmSql AS nrm
       |  FROM embeddings
       |  WHERE ${graft.sources.VecTakedown.notTombstonedSql}),
       |${ServeBooks.coarseCentsCteSql},
       |${ServeBooks.assignRankCteSql},
       |cells AS (
       |  SELECT e.vec_id, e.label, e.v, e.nrm, r.cid AS cell
       |  FROM e JOIN r ON e.vec_id = r.vec_id AND r.rk = 1),
       |probes AS (
       |  SELECT e.vec_id AS query_id, e.label AS qlabel, e.v AS qv,
       |         e.nrm AS qnrm, r.cid AS probe
       |  FROM e JOIN r ON e.vec_id = r.vec_id
       |  WHERE r.rk <= $IvfProbes AND e.vec_id < $QuerySetSize),
       |c2 AS (
       |  SELECT query_id, qlabel AS label, cells.vec_id AS neighbor_id,
       |         list_dot_product(qv, cells.v) / (qnrm * cells.nrm) AS cos
       |  FROM probes JOIN cells
       |    ON probe = cell AND cells.vec_id <> query_id
       |   AND cells.label = qlabel),
       |rr AS (
       |  SELECT query_id, label, neighbor_id, cos,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
       |  FROM c2)
       |SELECT query_id, label, neighbor_id, cos, rn FROM rr
       |WHERE rn <= $K ORDER BY query_id, rn""".stripMargin
  }

  private val nrmSql =
    "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
  private val pairCosSql =
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / (a.nrm * b.nrm)"
  private val qCosSql =
    "list_dot_product(qv::DOUBLE[], e.embedding::DOUBLE[]) / (q.qnrm * e.nrm)"

  // shared assignment CTE for the codebook-clustered oracles
  // (q101/q102): nearest frozen centroid per vector. The RANKING runs
  // on the serve-style score ‖c‖²−2·(v·c) — the exact arithmetic of
  // the Spark side's native graft_ivf_cell argmin (ServeBooks.
  // assignRankCteSql's form), so the chosen cell agrees bit-for-bit by
  // construction; `dist` (which q101's domination test reads) keeps
  // its original nrm²−2vc+cnrm² expression, only computed for the
  // winner's row like the Spark side's post-assignment broadcast join.
  private def asgCteSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding, $nrmSql AS nrm FROM embeddings),
       |${graft.llm.CurationSnapshot.centsCteSql("snap")},
       |cents AS (
       |  SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cnrm
       |  FROM snap),
       |ad AS (
       |  SELECT e.vec_id, e.embedding, e.nrm, c.cid,
       |         list_dot_product(c.cv, c.cv)
       |           - 2.0 * list_dot_product(e.embedding::DOUBLE[], c.cv)
       |           AS score,
       |         e.nrm * e.nrm
       |           - 2.0 * list_dot_product(e.embedding::DOUBLE[], c.cv)
       |           + c.cnrm * c.cnrm AS dist
       |  FROM e, cents c),
       |rk AS (
       |  SELECT vec_id, embedding, nrm, cid, dist,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
       |  FROM ad),
       |asg AS (
       |  SELECT vec_id, embedding, nrm, cid AS cell, dist FROM rk WHERE rk = 1)""".stripMargin

  /** Exact-L2 brute oracle body — truth arm of q162/q163. */
  private lazy val knnBruteL2Sql: String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (
       |  SELECT vec_id AS query_id, v AS qv FROM e
       |  WHERE vec_id < $QuerySetSize),
       |c AS (
       |  SELECT query_id, e.vec_id AS neighbor_id,
       |         list_dot_product(qv, qv) - 2.0 * list_dot_product(qv, e.v)
       |           + list_dot_product(e.v, e.v) AS l2
       |  FROM q, e WHERE e.vec_id <> q.query_id),
       |r AS (
       |  SELECT query_id, neighbor_id, l2,
       |         CAST(row_number() OVER (PARTITION BY query_id
       |              ORDER BY l2, neighbor_id) AS BIGINT) AS rn
       |  FROM c)
       |SELECT query_id, neighbor_id, l2, rn FROM r
       |WHERE rn <= $K ORDER BY query_id, rn""".stripMargin

  /** q64's oracle body — also the ADC arm of q162's recall audit. */
  private lazy val knnIvfPqSql: String = {
      import graft.llm.{Pq, PqTrain, ServeBooks}
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |  WHERE ${graft.sources.VecTakedown.notTombstonedSql}),
         |${ServeBooks.coarseCentsCteSql},
         |${ServeBooks.pqBooksCteSql},
         |${ServeBooks.assignRankCteSql},
         |pqd AS (
         |  SELECT e.vec_id, p.m, p.k, p.ck,
         |         list_dot_product(p.ck, p.ck)
         |           - 2.0 * list_dot_product(
         |               list_slice(e.v, p.m * ${PqTrain.SubDim} + 1,
         |                 (p.m + 1) * ${PqTrain.SubDim}), p.ck) AS d
         |  FROM e, pq p),
         |pqr AS (
         |  SELECT vec_id, m, ck,
         |         row_number() OVER (PARTITION BY vec_id, m
         |              ORDER BY d, k) AS prk
         |  FROM pqd),
         |xh AS (
         |  SELECT vec_id, flatten(list(ck ORDER BY m)) AS xhat
         |  FROM pqr WHERE prk = 1 GROUP BY vec_id),
         |cells AS (
         |  SELECT e.vec_id, e.v, xh.xhat, r.cid AS cell
         |  FROM e JOIN xh ON e.vec_id = xh.vec_id
         |    JOIN r ON e.vec_id = r.vec_id AND r.rk = 1),
         |probes AS (
         |  SELECT e.vec_id AS query_id, e.v AS qv, r.cid AS probe
         |  FROM e JOIN r ON e.vec_id = r.vec_id
         |  WHERE r.rk <= $IvfProbes AND e.vec_id < $QuerySetSize),
         |c AS (
         |  SELECT p.query_id, p.qv, cells.vec_id AS neighbor_id, cells.v AS nv,
         |         ${Pq.adcSql("p.qv", "cells.xhat")} AS adc
         |  FROM probes p JOIN cells
         |    ON p.probe = cells.cell AND cells.vec_id <> p.query_id),
         |short AS (
         |  SELECT query_id, qv, neighbor_id, nv,
         |         row_number() OVER (PARTITION BY query_id
         |              ORDER BY adc, neighbor_id) AS rs
         |  FROM c),
         |rr AS (
         |  SELECT query_id, neighbor_id,
         |         (list_dot_product(qv, qv) - 2.0 * list_dot_product(qv, nv)
         |           + list_dot_product(nv, nv)) AS l2,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |              ORDER BY (list_dot_product(qv, qv)
         |                - 2.0 * list_dot_product(qv, nv)
         |                + list_dot_product(nv, nv)), neighbor_id) AS BIGINT) AS rn
         |  FROM short WHERE rs <= $PqShortlist)
         |SELECT query_id, neighbor_id, l2, rn FROM rr
         |WHERE rn <= $K ORDER BY query_id, rn""".stripMargin
  }

  /** q164's oracle body — also the residual-ADC arm of q165's audit.
    * Same shape as q64's, with the fine stage over the residual
    * r = v − c(v) and the reconstruction c(v) + PQ(r); every
    * elementwise subtract/add is a single IEEE op in both engines, so
    * the compared doubles stay bit-identical. */
  private lazy val knnIvfPqResSql: String = {
      import graft.llm.{Pq, PqTrain, ServeBooks}
      val dim = VectorOps.Dim
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |  WHERE ${graft.sources.VecTakedown.notTombstonedSql}),
         |${ServeBooks.coarseCentsCteSql},
         |${ServeBooks.pqResBooksCteSql},
         |${ServeBooks.assignRankCteSql},
         |resid AS (
         |  SELECT e.vec_id, e.v, c.cv,
         |         list_transform(range(1, ${dim + 1}),
         |           i -> e.v[i] - c.cv[i]) AS rv
         |  FROM e JOIN r ON e.vec_id = r.vec_id AND r.rk = 1
         |    JOIN cents c ON c.cid = r.cid),
         |pqd AS (
         |  SELECT resid.vec_id, p.m, p.k, p.ck,
         |         list_dot_product(p.ck, p.ck)
         |           - 2.0 * list_dot_product(
         |               list_slice(resid.rv, p.m * ${PqTrain.SubDim} + 1,
         |                 (p.m + 1) * ${PqTrain.SubDim}), p.ck) AS d
         |  FROM resid, rpq p),
         |pqx AS (
         |  SELECT vec_id, m, ck,
         |         row_number() OVER (PARTITION BY vec_id, m
         |              ORDER BY d, k) AS prk
         |  FROM pqd),
         |xh AS (
         |  SELECT vec_id, flatten(list(ck ORDER BY m)) AS rhat
         |  FROM pqx WHERE prk = 1 GROUP BY vec_id),
         |cells AS (
         |  SELECT resid.vec_id, resid.v,
         |         list_transform(range(1, ${dim + 1}),
         |           i -> resid.cv[i] + xh.rhat[i]) AS xhat,
         |         r.cid AS cell
         |  FROM resid JOIN xh ON resid.vec_id = xh.vec_id
         |    JOIN r ON resid.vec_id = r.vec_id AND r.rk = 1),
         |probes AS (
         |  SELECT e.vec_id AS query_id, e.v AS qv, r.cid AS probe
         |  FROM e JOIN r ON e.vec_id = r.vec_id
         |  WHERE r.rk <= $IvfProbes AND e.vec_id < $QuerySetSize),
         |c AS (
         |  SELECT p.query_id, p.qv, cells.vec_id AS neighbor_id, cells.v AS nv,
         |         ${Pq.adcSql("p.qv", "cells.xhat")} AS adc
         |  FROM probes p JOIN cells
         |    ON p.probe = cells.cell AND cells.vec_id <> p.query_id),
         |short AS (
         |  SELECT query_id, qv, neighbor_id, nv,
         |         row_number() OVER (PARTITION BY query_id
         |              ORDER BY adc, neighbor_id) AS rs
         |  FROM c),
         |rr AS (
         |  SELECT query_id, neighbor_id,
         |         (list_dot_product(qv, qv) - 2.0 * list_dot_product(qv, nv)
         |           + list_dot_product(nv, nv)) AS l2,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |              ORDER BY (list_dot_product(qv, qv)
         |                - 2.0 * list_dot_product(qv, nv)
         |                + list_dot_product(nv, nv)), neighbor_id) AS BIGINT) AS rn
         |  FROM short WHERE rs <= $PqShortlist)
         |SELECT query_id, neighbor_id, l2, rn FROM rr
         |WHERE rn <= $K ORDER BY query_id, rn""".stripMargin
  }

  /** q113's oracle body — also the int8-ADC arm of q163's audit. */
  private lazy val knnIvfInt8Sql: String =
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |  WHERE ${graft.sources.VecTakedown.notTombstonedSql}),
         |ex AS (
         |  SELECT unnest(embedding)::DOUBLE AS x,
         |         generate_subscripts(embedding, 1) AS i
         |  FROM embeddings
         |  WHERE ${graft.sources.VecTakedown.notTombstonedSql}),
         |dims AS (
         |  SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
         |  FROM (SELECT i, min(x) AS mn, max(x) AS mx FROM ex GROUP BY i)),
         |${graft.llm.ServeBooks.coarseCentsCteSql},
         |${graft.llm.ServeBooks.assignRankCteSql},
         |cells AS (
         |  SELECT e.vec_id, e.v,
         |         list_transform(range(1, ${VectorOps.Dim + 1}), i ->
         |           CASE WHEN mxs[i] = mns[i] THEN mns[i]
         |                ELSE mns[i] +
         |                  ((least(255, greatest(0,
         |                     floor(((e.v[i] - mns[i]) * 255.0)
         |                       / (mxs[i] - mns[i])))) + 0.5)
         |                   * (mxs[i] - mns[i])) / 255.0
         |           END) AS xhat,
         |         r.cid AS cell
         |  FROM e CROSS JOIN dims
         |    JOIN r ON e.vec_id = r.vec_id AND r.rk = 1),
         |probes AS (
         |  SELECT e.vec_id AS query_id, e.v AS qv, r.cid AS probe
         |  FROM e JOIN r ON e.vec_id = r.vec_id
         |  WHERE r.rk <= $IvfProbes AND e.vec_id < $QuerySetSize),
         |c AS (
         |  SELECT p.query_id, p.qv, cells.vec_id AS neighbor_id, cells.v AS nv,
         |         ${graft.llm.Pq.adcSql("p.qv", "cells.xhat")} AS adc
         |  FROM probes p JOIN cells
         |    ON p.probe = cells.cell AND cells.vec_id <> p.query_id),
         |short AS (
         |  SELECT query_id, qv, neighbor_id, nv,
         |         row_number() OVER (PARTITION BY query_id
         |              ORDER BY adc, neighbor_id) AS rs
         |  FROM c),
         |rr AS (
         |  SELECT query_id, neighbor_id,
         |         (list_dot_product(qv, qv) - 2.0 * list_dot_product(qv, nv)
         |           + list_dot_product(nv, nv)) AS l2,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |              ORDER BY (list_dot_product(qv, qv)
         |                - 2.0 * list_dot_product(qv, nv)
         |                + list_dot_product(nv, nv)), neighbor_id) AS BIGINT) AS rn
         |  FROM short WHERE rs <= $Int8Shortlist)
         |SELECT query_id, neighbor_id, l2, rn FROM rr
         |WHERE rn <= $K ORDER BY query_id, rn""".stripMargin

  val oracles: Map[String, String] = Map(
    "q193_radius_search" -> radiusSearchSql,
    "q194_radius_search_ivf" -> radiusSearchIvfSql,
    "q198_radius_recall" -> radiusRecallSql,
    // same affine quantization; expression shapes (parenthesization,
    // bucket-center dequant) mirror the Spark side so the IEEE doubles
    // are bit-identical before the integer floors
    "q106_int8_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, unnest(embedding)::DOUBLE AS x,
        |         generate_subscripts(embedding, 1)::BIGINT AS i
        |  FROM embeddings),
        |dims AS (SELECT i, min(x) AS mn, max(x) AS mx FROM e GROUP BY i),
        |q AS (
        |  SELECT vec_id, x, mn, mx,
        |         CASE WHEN mx = mn THEN 0
        |              ELSE least(255, greatest(0,
        |                floor(((x - mn) * 255.0) / (mx - mn))))::BIGINT
        |         END AS code
        |  FROM e JOIN dims USING (i)),
        |r AS (
        |  SELECT vec_id, code,
        |         x - (mn + ((code + 0.5) * (mx - mn)) / 255.0) AS err
        |  FROM q)
        |SELECT vec_id, sum(code)::BIGINT AS code_sum,
        |       sum(floor(err * err * 1000000000.0)::BIGINT)::BIGINT
        |         AS ssq_scaled
        |FROM r GROUP BY vec_id
        |ORDER BY ssq_scaled DESC, vec_id LIMIT 20""".stripMargin,
    // q116: same unnest idiom as q106; the join on vec_id pairs the
    // dimensions DuckDB-side (the Spark plan forms pairs row-locally
    // instead — semantics identical, N·D² rows either way at sf0.01)
    "q155_label_cohesion" ->
      (s"""WITH e AS (
         |  SELECT vec_id, label, embedding, $nrmSql AS nrm FROM embeddings),
         |pri AS (
         |  SELECT vec_id, label, embedding, nrm,
         |         row_number() OVER (PARTITION BY label ORDER BY
         |           ('0x' || substr(md5('lrep|' || vec_id), 1, 15))::BIGINT,
         |           vec_id) AS rn
         |  FROM e),
         |reps AS (
         |  SELECT label, vec_id, embedding, nrm FROM pri WHERE rn <= $RepK),
         |p AS (
         |  SELECT a.label AS label_a, b.label AS label_b,
         |         CAST(list_dot_product(a.embedding::DOUBLE[],
         |                               b.embedding::DOUBLE[])
         |              / (a.nrm * b.nrm) AS DECIMAL(18,9)) AS ts
         |  FROM reps a JOIN reps b
         |    ON a.label < b.label
         |    OR (a.label = b.label AND a.vec_id < b.vec_id))
         |SELECT CAST(label_a AS BIGINT) AS label_a,
         |       CAST(label_b AS BIGINT) AS label_b,
         |       count(*)::BIGINT AS n_pairs,
         |       CAST(sum(ts) AS DOUBLE) AS cos_sum
         |FROM p GROUP BY label_a, label_b
         |ORDER BY label_a, label_b""".stripMargin),
    "q150_pca_power" ->
      (s"""WITH ei AS (
         |  SELECT vec_id,
         |         (generate_subscripts(embedding, 1) - 1)::BIGINT AS i,
         |         CAST(floor(unnest(embedding)::DOUBLE * 1000) AS BIGINT) AS x
         |  FROM embeddings),
         |cov AS MATERIALIZED (
         |  SELECT a.i AS i, b.i AS j,
         |         ((count(*) * sum(a.x * b.x) - sum(a.x) * sum(b.x))::BIGINT)
         |           ::HUGEINT AS c
         |  FROM ei a JOIN ei b USING (vec_id)
         |  GROUP BY a.i, b.i),
         |v0 AS (SELECT DISTINCT i AS dim, $PowerScale::HUGEINT AS v FROM cov),
         |${(1 to PowerRounds).map(powerIterCte).mkString(",\n")}
         |SELECT CAST(dim AS BIGINT) AS dim, CAST(v AS BIGINT) AS v
         |FROM v$PowerRounds ORDER BY dim""".stripMargin),
    "q116_embed_covariance" ->
      """WITH ei AS (
        |  SELECT vec_id,
        |         (generate_subscripts(embedding, 1) - 1)::BIGINT AS i,
        |         CAST(floor(unnest(embedding)::DOUBLE * 1000) AS BIGINT) AS x
        |  FROM embeddings)
        |SELECT a.i AS i, b.i AS j, count(*)::BIGINT AS n,
        |       (count(*) * sum(a.x * b.x) - sum(a.x) * sum(b.x))::BIGINT
        |         AS cov_num
        |FROM ei a JOIN ei b USING (vec_id)
        |WHERE b.i >= a.i
        |GROUP BY a.i, b.i
        |ORDER BY i, j""".stripMargin,
    "q101_semdedup_prune" ->
      s"""$asgCteSql
         |SELECT g.vec_id, g.cell,
         |  NOT EXISTS (
         |    SELECT 1 FROM asg o
         |    WHERE o.cell = g.cell
         |      AND (o.dist < g.dist
         |           OR (o.dist = g.dist AND o.vec_id < g.vec_id))
         |      AND list_dot_product(o.embedding::DOUBLE[], g.embedding::DOUBLE[])
         |            / (o.nrm * g.nrm) >= 0.4) AS kept
         |FROM asg g ORDER BY g.vec_id""".stripMargin,

    "q102_centroid_update" ->
      s"""$asgCteSql,
         |sums AS (
         |  SELECT cell, i,
         |         CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE)
         |                  * 1000000000) AS BIGINT)) AS BIGINT) AS s
         |  FROM asg, unnest(range(1, 65)) AS u(i)
         |  GROUP BY cell, i),
         |members AS (
         |  SELECT cell, count(*)::BIGINT AS n_members FROM asg GROUP BY cell)
         |SELECT m.cell, m.n_members, i::BIGINT AS dim,
         |       ((s::DOUBLE / 1000000000) / m.n_members) AS mean
         |FROM sums JOIN members m USING (cell)
         |ORDER BY m.cell, dim""".stripMargin,

    // int8 ADC: the dims CTE recomputes the same exact per-dim min/max
    // the Spark side collected; dequant expression shapes mirror q106
    "q113_knn_ivf_int8" -> knnIvfInt8Sql,

    "q162_adc_recall" ->
      s"""WITH brute AS ($knnBruteL2Sql),
         |ivf AS ($knnIvfPqSql)
         |SELECT b.query_id, count(i.neighbor_id)::BIGINT AS hits,
         |       CAST($K AS BIGINT) AS k
         |FROM brute b
         |LEFT JOIN ivf i
         |  ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
         |GROUP BY b.query_id
         |ORDER BY b.query_id""".stripMargin,

    "q163_int8_recall" ->
      s"""WITH brute AS ($knnBruteL2Sql),
         |ivf AS ($knnIvfInt8Sql)
         |SELECT b.query_id, count(i.neighbor_id)::BIGINT AS hits,
         |       CAST($K AS BIGINT) AS k
         |FROM brute b
         |LEFT JOIN ivf i
         |  ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
         |GROUP BY b.query_id
         |ORDER BY b.query_id""".stripMargin,

    "q64_knn_ivfpq" -> knnIvfPqSql,

    "q164_knn_ivfpq_res" -> knnIvfPqResSql,

    "q168_adc_rank_audit" ->
      s"""WITH brute AS ($knnBruteL2Sql),
         |pqa AS ($knnIvfPqSql),
         |rsa AS ($knnIvfPqResSql),
         |t AS (SELECT query_id, neighbor_id FROM brute),
         |a1 AS (
         |  SELECT t.query_id, 'pq' AS arm,
         |         COALESCE(sum(60 // p.rn), 0)::BIGINT AS rw60,
         |         count(p.neighbor_id)::BIGINT AS hits
         |  FROM t LEFT JOIN pqa p
         |    ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id
         |  GROUP BY t.query_id),
         |a2 AS (
         |  SELECT t.query_id, 'res' AS arm,
         |         COALESCE(sum(60 // r.rn), 0)::BIGINT AS rw60,
         |         count(r.neighbor_id)::BIGINT AS hits
         |  FROM t LEFT JOIN rsa r
         |    ON r.query_id = t.query_id AND r.neighbor_id = t.neighbor_id
         |  GROUP BY t.query_id)
         |SELECT query_id, arm, rw60, hits FROM a1
         |UNION ALL SELECT query_id, arm, rw60, hits FROM a2
         |ORDER BY arm, query_id""".stripMargin,

    "q165_res_recall" ->
      s"""WITH brute AS ($knnBruteL2Sql),
         |ivf AS ($knnIvfPqResSql)
         |SELECT b.query_id, count(i.neighbor_id)::BIGINT AS hits,
         |       CAST($K AS BIGINT) AS k
         |FROM brute b
         |LEFT JOIN ivf i
         |  ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
         |GROUP BY b.query_id
         |ORDER BY b.query_id""".stripMargin,

    "q30_embed_neardup" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, $nrmSql AS nrm FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $pairCosSql AS cos
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE $pairCosSql >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,

    "q31_knn_brute" -> knnBruteSql,
    "q189_mmr_rerank" -> mmrSql,
    "q190_mmr_rerank_ivf" -> mmrIvfSql,

    "q32_knn_lsh" -> {
      val perTable = (0 until PlaneTables).map { t =>
        s"""SELECT vec_id, $t AS t,
           |       ${VectorOps.planeBucketSql("embedding::DOUBLE[]", Planes(t))} AS bkt
           |FROM embeddings""".stripMargin
      }.mkString("\n  UNION ALL\n")
      val maskList = ProbeMasks.mkString("[", ", ", "]")
      s"""WITH e AS (
         |  SELECT vec_id, embedding, $nrmSql AS nrm FROM embeddings),
         |eb AS (
         |  $perTable),
         |qb AS (
         |  SELECT vec_id AS query_id, t, bkt AS qbkt
         |  FROM eb WHERE vec_id < $QuerySetSize),
         |probes AS (
         |  SELECT query_id, t, xor(qbkt, CAST(m AS BIGINT)) AS probe
         |  FROM qb CROSS JOIN (SELECT unnest($maskList) AS m) mm),
         |cand AS (
         |  SELECT DISTINCT p.query_id, d.vec_id AS neighbor_id
         |  FROM probes p JOIN eb d
         |    ON p.t = d.t AND p.probe = d.bkt AND d.vec_id <> p.query_id),
         |q AS (
         |  SELECT vec_id AS qid, embedding AS qv, nrm AS qnrm
         |  FROM e WHERE vec_id < $QuerySetSize),
         |c AS (
         |  SELECT cand.query_id, cand.neighbor_id, $qCosSql AS cos
         |  FROM cand
         |  JOIN q ON cand.query_id = q.qid
         |  JOIN e ON cand.neighbor_id = e.vec_id),
         |r AS (
         |  SELECT query_id, neighbor_id, cos,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
         |  FROM c)
         |SELECT query_id, neighbor_id, cos, rn FROM r
         |WHERE rn <= $K ORDER BY query_id, rn""".stripMargin
    },

    "q52_embed_neardup_lsh" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, $nrmSql AS nrm,
         |         ${VectorOps.signBucketSql("embedding", LshBits)} AS bkt
         |  FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $pairCosSql AS cos
         |FROM e a JOIN e b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
         |WHERE $pairCosSql >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,

    "q55_knn_ivf" -> knnIvfSql,
    "q181_knn_filtered" -> knnIvfFilteredSql,

    // q161: probe ranks come straight from the assignment CTE's rk
    // (the probe order IS the assignment order); six budgets re-rank
    // the admitted frame, brute truth is q31's oracle body
    "q161_probe_curve" -> {
      import graft.llm.ServeBooks
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v, $nrmSql AS nrm
         |  FROM embeddings),
         |${ServeBooks.coarseCentsCteSql},
         |${ServeBooks.assignRankCteSql},
         |cells AS (
         |  SELECT e.vec_id, e.v, e.nrm, r.cid AS cell
         |  FROM e JOIN r ON e.vec_id = r.vec_id AND r.rk = 1),
         |qprobes AS (
         |  SELECT e.vec_id AS query_id, e.v AS qv, e.nrm AS qnrm,
         |         r.rk AS arank, r.cid AS probe
         |  FROM e JOIN r ON e.vec_id = r.vec_id
         |  WHERE e.vec_id < $QuerySetSize),
         |adm AS (
         |  SELECT query_id, cells.vec_id AS neighbor_id,
         |         list_dot_product(qv, cells.v) / (qnrm * cells.nrm) AS cos,
         |         arank
         |  FROM qprobes JOIN cells
         |    ON probe = cell AND cells.vec_id <> query_id),
         |budgets AS (
         |  SELECT CAST(unnest([${ProbeBudgets.mkString(", ")}]) AS BIGINT)
         |    AS n_probes),
         |ivf AS (
         |  SELECT n_probes, query_id, neighbor_id FROM (
         |    SELECT b.n_probes, a.query_id, a.neighbor_id,
         |           row_number() OVER (PARTITION BY b.n_probes, a.query_id
         |                ORDER BY a.cos DESC, a.neighbor_id) AS rn
         |    FROM adm a CROSS JOIN budgets b
         |    WHERE a.arank <= b.n_probes)
         |  WHERE rn <= $K),
         |brute AS ($knnBruteSql)
         |SELECT b.n_probes, count(i.neighbor_id)::BIGINT AS hits,
         |       count(*)::BIGINT AS denom
         |FROM (SELECT bb.n_probes, br.query_id, br.neighbor_id
         |      FROM brute br CROSS JOIN budgets bb) b
         |LEFT JOIN ivf i
         |  ON i.n_probes = b.n_probes AND i.query_id = b.query_id
         |     AND i.neighbor_id = b.neighbor_id
         |GROUP BY b.n_probes
         |ORDER BY b.n_probes""".stripMargin
    },

    // q158: same artifact cents + assignment CTEs as q55; dist is the
    // argmin's own score plus dot(v,v), DECIMAL-summed per cell over a
    // dense 32-cell frame (empty cells report 0)
    "q158_ivf_health" -> {
      import graft.llm.ServeBooks
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |${ServeBooks.coarseCentsCteSql},
         |${ServeBooks.assignRankCteSql},
         |asg AS (
         |  SELECT a.vec_id, a.cid,
         |         list_dot_product(e.v, e.v) + a.score AS dist
         |  FROM a
         |  JOIN r ON a.vec_id = r.vec_id AND a.cid = r.cid AND r.rk = 1
         |  JOIN e ON e.vec_id = a.vec_id),
         |agg AS (
         |  SELECT cid, count(*)::BIGINT AS n_members,
         |         sum(CAST(dist AS DECIMAL(18,9))) AS ds
         |  FROM asg GROUP BY cid)
         |SELECT c.cid, coalesce(n_members, 0)::BIGINT AS n_members,
         |       CAST(coalesce(ds, 0) AS DOUBLE) AS dist_sum
         |FROM (SELECT DISTINCT cid FROM cents) c
         |LEFT JOIN agg ON c.cid = agg.cid
         |ORDER BY c.cid""".stripMargin
    },

    // q159: the pinned snapshot artifact vs the trained artifact,
    // squared component differences floored at the 1e-12 quantum
    // (q116's integer convention) so no float sum crosses engines
    "q159_codebook_drift" -> {
      import graft.llm.ServeBooks
      s"""WITH ${graft.llm.CurationSnapshot.centsCteSql("ref")},
         |${ServeBooks.coarseCentsCteSql.replace("cents AS", "trained AS")}
         |SELECT ref.cid,
         |       list_sum(list_transform(range(1, ${VectorOps.Dim + 1}), i ->
         |         CAST(floor((ref.cv[i] - trained.cv[i])
         |                    * (ref.cv[i] - trained.cv[i])
         |                    * 1000000000000.0) AS BIGINT)))::BIGINT
         |         AS drift_scaled,
         |       CAST(${VectorOps.Dim} AS BIGINT) AS n_dims
         |FROM ref JOIN trained ON ref.cid = trained.cid
         |ORDER BY ref.cid""".stripMargin
    },

    // q129: both arms are the EXACT q31/q55 oracle texts, nested as
    // CTE subqueries (their own WITHs scope locally) — the audit is
    // definitionally over the same two result sets
    "q134_prefix_recall" ->
      s"""WITH brute AS ($knnBruteSql),
         |pfx AS (${bruteSqlOver(s"(SELECT vec_id, list_slice(embedding, 1, $PrefixDims) AS embedding FROM embeddings) pe")})
         |SELECT b.query_id, count(p.neighbor_id)::BIGINT AS hits,
         |       CAST($K AS BIGINT) AS k, CAST($PrefixDims AS BIGINT) AS dims
         |FROM brute b
         |LEFT JOIN pfx p
         |  ON p.query_id = b.query_id AND p.neighbor_id = b.neighbor_id
         |GROUP BY b.query_id
         |ORDER BY b.query_id""".stripMargin,

    "q129_ann_recall" ->
      s"""WITH brute AS ($knnBruteSql),
         |ivf AS ($knnIvfSql)
         |SELECT b.query_id, count(i.neighbor_id)::BIGINT AS hits,
         |       CAST($K AS BIGINT) AS k
         |FROM brute b
         |LEFT JOIN ivf i
         |  ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
         |GROUP BY b.query_id
         |ORDER BY b.query_id""".stripMargin,

    "q77_semantic_sample" -> {
      s"""WITH e AS (
         |  SELECT vec_id, embedding, $nrmSql AS nrm FROM embeddings),
         |${graft.llm.CurationSnapshot.centsCteSql("snap")},
         |cents AS (
         |  SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cnrm
         |  FROM snap),
         |a AS (
         |  SELECT e.vec_id, c.cid,
         |         list_dot_product(c.cv, c.cv)
         |           - 2.0 * list_dot_product(e.embedding::DOUBLE[], c.cv)
         |           AS score,
         |         e.nrm * e.nrm
         |           - 2.0 * list_dot_product(e.embedding::DOUBLE[], c.cv)
         |           + c.cnrm * c.cnrm AS dist
         |  FROM e, cents c),
         |r AS (
         |  SELECT vec_id, cid, dist,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
         |  FROM a),
         |cells AS (SELECT vec_id, cid AS cell, dist FROM r WHERE rk = 1),
         |ranked AS (
         |  SELECT vec_id, cell, dist,
         |         CAST(row_number() OVER (PARTITION BY cell
         |              ORDER BY dist, vec_id) AS BIGINT) AS cell_rank
         |  FROM cells)
         |SELECT vec_id, cell, dist, cell_rank FROM ranked
         |WHERE cell_rank <= 16 ORDER BY cell, cell_rank""".stripMargin
    },

    "q59_array_ops" -> {
      val ones = Seq.fill(VectorOps.Dim)("1.0").mkString("[", ", ", "]")
      s"""SELECT vec_id,
         |       CAST(len(embedding) AS BIGINT) AS n,
         |       CAST(list_max(embedding) AS DOUBLE) AS vmax,
         |       CAST(list_min(embedding) AS DOUBLE) AS vmin,
         |       list_dot_product(embedding::DOUBLE[], $ones::DOUBLE[]) AS vsum
         |FROM embeddings ORDER BY vec_id""".stripMargin
    }
  )
}
