package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication primitives for large-scale corpus curation: exact
  * (digest-groupBy), MinHash+LSH banding, SimHash, and n-gram Jaccard.
  *
  * Everything here is declarative DataFrame code over codegen'd builtins —
  * no UDFs — so Catalyst keeps pushdown/partial-agg, and every hash is
  * `md5` (bit-identical in DuckDB) so the whole family is exact-oracle-able.
  *
  * Scale design (100 TB posture):
  *   - exact dedup groups by a 128-bit digest, never by the full text, so
  *     the shuffle carries 32-byte keys instead of documents;
  *   - MinHash/LSH replaces the O(n²) pair space with per-band
  *     bucket-equality joins; true Jaccard is verified only on candidates;
  *   - SimHash pairs join on 12-bit fingerprint bands (pigeonhole: hamming
  *     ≤ 3 ⇒ at least one of 4 bands equal), again no crossJoin.
  */
object Dedup {

  /** Distinct (doc_id, token) pairs — the token-set view of each document. */
  def tokenSet(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .where(col("t") =!= "")
      .distinct()

  /** SQL twin of [[tokenSet]] as a CTE body over `documents`. */
  val tokenSetSql: String =
    """SELECT DISTINCT doc_id, t FROM (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
      |  FROM documents) WHERE t <> ''""".stripMargin

  /** Distinct word `n`-gram shingles per document.
    *
    * Typed flatMap, not `explode(transform(sequence…, slice…))`: the
    * higher-order-function formulation evaluates interpreted and costs
    * ~5 s at sf0.1 just to shingle 5000 docs; a native sliding window is
    * an order of magnitude cheaper and the downstream is a shuffle
    * (distinct) either way.
    */
  def shingles(docs: DataFrame, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val w = text.trim.split("\\s+")
        if (w.length >= n) w.sliding(n).map(g => (id, g.mkString(" ")))
        else Iterator.empty
      }
      .toDF("doc_id", "s").distinct()
  }

  /** SQL twin of [[shingles]] (DuckDB list slicing is 1-based inclusive).
    * `from` may name any relation with (doc_id, text) — q76 shingles an
    * augmented CTE rather than the raw table. */
  def shinglesSql(n: Int, from: String = "documents"): String =
    s"""SELECT DISTINCT doc_id, array_to_string(w[i+1:i+$n], ' ') AS s FROM (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
       |  FROM $from) , unnest(range(0, greatest(len(w) - ${n - 1}, 0))) AS u(i)""".stripMargin

  // ——— MinHash ————————————————————————————————————————————————————————
  // k universal-hash min-hashes over ONE md5 per token: the token's
  // 60-bit hex prefix x = int(md5(t)[0:15], 16) mod P feeds k affine
  // permutations h_i(x) = (a_i·x + b_i) mod P over the Mersenne prime
  // P = 2^31−1. One md5 + k multiply-adds per token instead of k md5s —
  // measured 7× cheaper at sf0.1 (14.6 s → ~2 s for q26) — and every
  // step is exact BIGINT arithmetic both engines reproduce bit-for-bit
  // (a·x < 2^62 never overflows a signed 64-bit).

  val MinHashK = 16
  val Bands = 4
  val RowsPerBand: Int = MinHashK / Bands
  val MinHashP = 2147483647L // 2^31 − 1, prime

  /** Seed-derived (a_i, b_i) permutation parameters, a_i ∈ [1, P),
    * b_i ∈ [0, P) — fixed constants, embedded as literals in the SQL
    * twins so the oracle is the identical hash family. */
  val Perms: Array[(Long, Long)] = {
    var state = 0x5DEECE66DACEFACEL
    def next31(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      state >>> 33
    }
    Array.fill(MinHashK)((next31() % (MinHashP - 1) + 1, next31() % MinHashP))
  }

  /** x: the token's md5 reduced to [0, P) — computed ONCE per token row,
    * before the k-way aggregation. graft_h60 is the native codegen'd
    * form of the oracle-side SQL chain in [[minhashTokenXSql]]. */
  def minhashTokenX(t: Column): Column =
    call_function("graft_h60", t) % MinHashP

  /** SQL twin of [[minhashTokenX]]. */
  def minhashTokenXSql(t: String): String =
    s"(('0x' || substr(md5($t), 1, 15))::BIGINT % $MinHashP)"

  /** (doc_id, h0..h{k-1}) minhash signature from a (doc_id, t) token set. */
  def minhashSig(tokens: DataFrame): DataFrame =
    minhashSigFromX(tokens.withColumn("x", minhashTokenX(col("t"))))

  /** Signature aggregation over an already-projected `x` column — for
    * callers that hash the token once and reuse it across plan branches. */
  def minhashSigFromX(withX: DataFrame): DataFrame = {
    val aggs = Perms.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("x") + lit(b)) % MinHashP).as(s"h$i")
    }.toSeq
    withX.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** SQL agg list matching [[minhashSig]], over a relation exposing `x`. */
  def minhashSigAggSql: String =
    Perms.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * x + $b) % $MinHashP) AS h$i"
    }.mkString(", ")

  /** (doc_id, band, bv): one md5-compressed bucket key per LSH band.
    * Band values join with '|' separators before hashing — BIGINTs render
    * identically in both engines, and the separator keeps the
    * concatenation unambiguous. */
  def minhashBands(sig: DataFrame): DataFrame =
    minhashBandsCfg(sig, RowsPerBand)

  /** [[minhashBands]] at an arbitrary rows-per-band r (r | MinHashK,
    * MinHashK/r bands) — the banding dial itself, so q182's recall
    * curve can sweep configurations over the SAME hash-once
    * signatures. The served config is [[RowsPerBand]]. */
  def minhashBandsCfg(sig: DataFrame, rowsPerBand: Int): DataFrame = {
    val nb = MinHashK / rowsPerBand
    val bandCols = (0 until nb).map { j =>
      val hs = (0 until rowsPerBand).map(r => col(s"h${rowsPerBand * j + r}"))
      struct(lit(j).as("band"), md5(concat_ws("|", hs: _*)).as("bv"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bv").as("bv"))
  }

  /** The LSH candidate stage shared by q27/q175/q180: self-join the
    * band table on (band, bv) equality, `<`-ordered so each unordered
    * pair appears once, distinct because a pair agreeing on several
    * bands would otherwise surface once per agreeing band. Returns
    * (da, db) with da < db. One definition holds the ordering and
    * distinct discipline for every consumer of the candidate set. */
  def bandedCandidates(bands: DataFrame): DataFrame =
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()

  /** SQL twin of [[minhashBands]] as a UNION ALL over `sig`. */
  def minhashBandsSql: String = minhashBandsCfgSql(RowsPerBand)

  /** SQL twin of [[minhashBandsCfg]]. */
  def minhashBandsCfgSql(rowsPerBand: Int): String =
    (0 until MinHashK / rowsPerBand).map { j =>
      val hs = (0 until rowsPerBand).map(r => s"h${rowsPerBand * j + r}")
        .mkString(", ")
      s"SELECT doc_id, $j AS band, md5(concat_ws('|', $hs)) AS bv FROM sig"
    }.mkString("\nUNION ALL\n")

  // ——— SimHash ————————————————————————————————————————————————————————
  // 48-bit weighted SimHash. Bit b of a token comes from hex digit
  // b/4 of md5(token): the digit's bit of weight (8 >> b%4). Both engines
  // read the same hex string, so signs agree exactly; weights are token
  // frequencies, all-integer math.

  val SimHashBits = 48

  /** Hex digits having the given weight-bit (8/4/2/1) set. */
  private val HexWithBit: Map[Int, String] = Map(
    8 -> "89abcdef", 4 -> "4567cdef", 2 -> "2367abef", 1 -> "13579bdf")

  private def bitPos(b: Int): Int = b / 4 + 1
  private def bitWeight(b: Int): Int = 8 >> (b % 4)

  /** (doc_id, simhash) from documents; token-frequency weighted.
    *
    * Rides the native row-local `graft_simhash` expression
    * ([[graft.functions.SimHash48]]): the composed aggregation form
    * exploded every token and shuffled TWO corpus-scale exchanges
    * (per-(doc,token) counts, then the 48-sum fold) to compute a
    * per-document value; the native loop computes the identical
    * integer sums in place, so the fingerprint pass is scan-shaped.
    * Sub-1-token docs (null fingerprint) are filtered, matching the
    * aggregation form's absent rows. SimHash48Spec proves bit-parity
    * with the old aggregation plan on real documents. */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        call_function("graft_simhash", col("text")).as("simhash"))
      .where(col("simhash").isNotNull)

  /** SQL twin of the digit projection: tc must expose (doc_id, t, cnt). */
  def simhashDigitsSql: String =
    "SELECT doc_id, cnt, " +
      (1 to SimHashBits / 4).map(p => s"substr(md5(t), $p, 1) AS d$p").mkString(", ") +
      " FROM tc"

  /** SQL twins: the 48 per-bit signed sums (over the digit projection),
    * and the fingerprint assembly. */
  def simhashSumsSql: String =
    (0 until SimHashBits).map { b =>
      val chars = HexWithBit(bitWeight(b)).map(c => s"'$c'").mkString(",")
      s"sum(CASE WHEN d${bitPos(b)} IN ($chars) THEN cnt ELSE -cnt END) AS s$b"
    }.mkString(", ")

  def simhashAssembleSql: String =
    "CAST(" + (0 until SimHashBits)
      .map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ") + " AS BIGINT)"

  /** Split a 48-bit fingerprint into 4 12-bit band values (pigeonhole for
    * hamming-distance ≤ 3 candidate generation). */
  def simhashBand(fp: Column, j: Int): Column =
    shiftright(fp, 12 * j).bitwiseAND(lit(4095L))

  def simhashBandSql(fp: String, j: Int): String =
    s"(($fp >> ${12 * j}) & 4095)"
}
