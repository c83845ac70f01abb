package graft.queries

import graft.Tables
import graft.llm.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Similarity search over the `embeddings` table (64-dim `array<float>`):
  * brute-force cosine as the correctness baseline, sign-LSH bucketing as
  * the scale path. Cosine is a strict left-fold (graft.llm.VectorOps) and
  * bit-matches DuckDB's `list_cosine_similarity`, so everything here is
  * exact-oracle-able.
  *
  * Scale posture: the brute crossJoin is O(n·q) with q a fixed query set —
  * acceptable only because q is bounded; the LSH variant replaces it with
  * a bucket-equality join whose cost is Σ_bucket |q∩bucket|·|bucket|.
  */
object SimilarityQueries {

  private val QuerySetSize = 50
  private val K = 5
  // 8 sign bits → 256 buckets: at testdata scale most queries keep a few
  // bucket-mates (recall demo); at cluster scale the bit count is the
  // recall/cost dial.
  private val LshBits = 8

  /** Vectors with their norm precomputed once per row — the pair stage
    * then pays a single 64-term dot per pair (`dot/(nrm_a*nrm_b)` is the
    * identical expression tree to `dot/(sqrt(dot aa)*sqrt(dot bb))`, so
    * oracle parity is preserved while per-pair work drops 3×). */
  private def vecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        VectorOps.toDoubleArr(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))

  /** q30 — brute near-dup pairs: all (a<b) with cosine ≥ 0.4. */
  def embedNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val cos = VectorOps.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .where(cos >= 0.4)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cos.as("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** q31 — brute-force cosine top-k for a fixed query set (vec_id < 50). */
  def knnBrute(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val q = e.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val cos = VectorOps.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.crossJoin(e).where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .where(col("rn") <= K)
      .orderBy(col("query_id"), col("rn"))
  }

  /** q32 — multi-probe sign-LSH ANN: bucket on the sign pattern of the
    * first 8 components; each query probes its own bucket plus all 8
    * Hamming-1 neighbors (a sign near a hyperplane flips under small
    * perturbation — probing adjacent buckets is the standard multi-probe
    * recall fix). 9 bucket-equality probes instead of a crossJoin. */
  def knnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
      .withColumn("bkt", VectorOps.signBucket(col("embedding"), LshBits))
    val probeArr = array(
      (col("qbkt") +: (0 until LshBits).map(j =>
        col("qbkt").bitwiseXOR(lit(1L << j)))): _*)
    val q = e.where(col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("bkt").as("qbkt"))
      .select(col("query_id"), col("qv"), col("qnrm"),
        explode(probeArr).as("probe"))
    val cos = VectorOps.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(e, col("probe") === col("bkt") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
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

  private val IvfCells = 16
  private val IvfProbes = 4

  /** q55 — IVF (inverted-file) ANN, the second scale path beside
    * sign-LSH: every vector is assigned to its nearest coarse-codebook
    * cell (here the codebook is the first 16 vectors — deterministic so
    * the oracle holds; at scale it would be k-means-trained, the
    * structure is identical), queries probe their 2 nearest cells, and
    * ranking happens only inside the probed cells. Join cost is
    * Σ_cell |queries probing cell|·|cell| — never a crossJoin.
    */
  def knnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = vecs(s, dir)
    val cents = e.where(col("vec_id") < IvfCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    // L2²(v,c) = ||v||² − 2·v·c + ||c||²
    val dist = col("nrm") * col("nrm") -
      lit(2.0) * VectorOps.dot(col("v"), col("cv")) + col("cnrm") * col("cnrm")
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist"), col("cid"))
    val assigned = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"), dist.as("dist"))
      .withColumn("rk", row_number().over(wAssign))
    val cells = assigned.where(col("rk") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid").as("cell"))
    val probes = assigned.where(col("rk") <= IvfProbes && col("vec_id") < QuerySetSize)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), col("cid").as("probe"))
    val cos = VectorOps.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(cells, col("probe") === col("cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(wRank).cast(LongType))
      .where(col("rn") <= K)
      .orderBy(col("query_id"), col("rn"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_embed_neardup" -> embedNearDup,
    "q31_knn_brute"     -> knnBrute,
    "q32_knn_lsh"       -> knnLsh,
    "q52_embed_neardup_lsh" -> embedNearDupLsh,
    "q55_knn_ivf"       -> knnIvf,
    "q59_array_ops"     -> arrayOps
  )

  private val nrmSql =
    "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
  private val pairCosSql =
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / (a.nrm * b.nrm)"
  private val qCosSql =
    "list_dot_product(qv::DOUBLE[], e.embedding::DOUBLE[]) / (q.qnrm * e.nrm)"

  val oracles: Map[String, String] = Map(
    "q30_embed_neardup" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, $nrmSql AS nrm FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, $pairCosSql AS cos
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE $pairCosSql >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,

    "q31_knn_brute" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, $nrmSql AS nrm FROM embeddings),
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
         |WHERE rn <= $K ORDER BY query_id, rn""".stripMargin,

    "q32_knn_lsh" -> {
      val probeList = ("qbkt" +: (0 until LshBits).map(j => s"xor(qbkt, ${1L << j})"))
        .mkString("[", ", ", "]")
      s"""WITH e AS (
         |  SELECT vec_id, embedding, $nrmSql AS nrm,
         |         ${VectorOps.signBucketSql("embedding", LshBits)} AS bkt
         |  FROM embeddings),
         |q0 AS (
         |  SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm, bkt AS qbkt
         |  FROM e WHERE vec_id < $QuerySetSize),
         |q AS (
         |  SELECT query_id, qv, qnrm, unnest($probeList) AS probe FROM q0),
         |c AS (
         |  SELECT query_id, e.vec_id AS neighbor_id, $qCosSql AS cos
         |  FROM q JOIN e ON q.probe = e.bkt AND e.vec_id <> q.query_id),
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

    "q55_knn_ivf" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, $nrmSql AS nrm FROM embeddings),
         |cents AS (
         |  SELECT vec_id AS cid, embedding AS cv, nrm AS cnrm
         |  FROM e WHERE vec_id < $IvfCells),
         |a AS (
         |  SELECT e.vec_id, e.embedding, e.nrm, c.cid,
         |         e.nrm * e.nrm
         |           - 2.0 * list_dot_product(e.embedding::DOUBLE[], c.cv::DOUBLE[])
         |           + c.cnrm * c.cnrm AS dist
         |  FROM e, cents c),
         |r AS (
         |  SELECT vec_id, embedding, nrm, cid,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
         |  FROM a),
         |cells AS (
         |  SELECT vec_id, embedding, nrm, cid AS cell FROM r WHERE rk = 1),
         |probes AS (
         |  SELECT vec_id AS query_id, embedding AS qv, nrm AS qnrm, cid AS probe
         |  FROM r WHERE rk <= $IvfProbes AND vec_id < $QuerySetSize),
         |c2 AS (
         |  SELECT query_id, cells.vec_id AS neighbor_id,
         |         list_dot_product(qv::DOUBLE[], cells.embedding::DOUBLE[])
         |           / (qnrm * cells.nrm) AS cos
         |  FROM probes JOIN cells ON probe = cell AND cells.vec_id <> query_id),
         |rr AS (
         |  SELECT query_id, neighbor_id, cos,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |              ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
         |  FROM c2)
         |SELECT query_id, neighbor_id, cos, rn FROM rr
         |WHERE rn <= $K ORDER BY query_id, rn""".stripMargin,

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
