package graft.queries

import graft.SparkSpec

/** q143 content-defined chunking: the chunks tile each document exactly,
  * the boundary set equals an independent rolling-hash recomputation,
  * and — the property that makes CDC worth having over q103's fixed
  * stride — an insertion at the head re-synchronizes: every chunk after
  * the first original boundary keeps its digest. */
class CdcChunksSpec extends SparkSpec {

  private val W = 4
  private val A = 1000003L
  private val P = 2147483647L
  private val Div = 16L

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def x(t: String): Long =
    java.lang.Long.parseLong(md5hex(t).take(15), 16) % P

  /** Independent boundary recomputation: positions p in [W, n] where the
    * Horner window hash divides, plus the forced end boundary. */
  private def boundaries(w: Array[String]): Seq[Int] = {
    val xs = w.map(x)
    val bs = (W to w.length).filter { p =>
      var h = xs(p - W); var i = p - W + 1
      while (i < p) { h = (h * A + xs(i)) % P; i += 1 }
      h % Div == 0L
    }
    if (bs.nonEmpty && bs.last == w.length) bs else bs :+ w.length
  }

  test("q143: chunks tile each doc and boundaries equal the brute recomputation") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = CurationQueries.cdcChunks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .groupBy(_._1)
    assert(got.nonEmpty)
    got.foreach { case (id, chunks) =>
      val w = docs(id).trim.split("\\s+").filter(_.nonEmpty)
      val sorted = chunks.sortBy(_._2)
      // dense 1-based chunk_idx, contiguous spans, total == token count
      assert(sorted.map(_._2).toSeq == (1L to sorted.length.toLong))
      sorted.foldLeft(0L) { case (prevEnd, (_, _, start, n, dig)) =>
        assert(start == prevEnd + 1, s"doc $id: gap at tok $start")
        val end = prevEnd + n
        assert(dig == md5hex(w.slice(start.toInt - 1, end.toInt).mkString(" ")),
          s"doc $id: digest mismatch at chunk starting $start")
        end
      }
      assert(sorted.map(_._4).sum == w.length.toLong)
      // boundary positions (chunk ends) equal the independent rule
      assert(sorted.map(c => (c._3 + c._4 - 1).toInt).toSeq == boundaries(w),
        s"doc $id: boundary set differs from brute rolling hash")
    }
  }

  test("q143: a head insertion re-synchronizes at the first original boundary") {
    import spark.implicits._
    // deterministic synthetic doc, long enough to carry several
    // boundaries; all-distinct tokens so no two fixed-stride windows can
    // coincide by periodicity (starts are 1 mod 32 vs 30 mod 32 after a
    // 3-token shift — never equal on unique content)
    val base = (0 until 400).map(i => s"tok$i").mkString(" ")
    val shifted = "alpha beta gamma " + base
    val dir = java.nio.file.Files.createTempDirectory("cdc_spec").toString
    Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CurationQueries.cdcChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4)))
    val origDigests = out.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    val newDigests = out.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSeq
    assert(origDigests.length > 3,
      s"base doc must chunk several times, got ${origDigests.length}")
    // every chunk after the first original boundary survives the shift:
    // orig[1..] must be a suffix of the shifted doc's digest sequence
    val tailSeq = origDigests.drop(1)
    assert(newDigests.takeRight(tailSeq.length) == tailSeq,
      "chunks after the first boundary must be shift-invariant")
    // and the fixed-stride chunker q103 does NOT resynchronize here —
    // the contrast that motivates CDC (every q103 chunk shifts by 3)
    val fix = CurationQueries.chunkOverlap(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4))).groupBy(_._1)
    val fo = fix(1L).sortBy(_._2).map(_._3).toSeq
    val fn = fix(2L).sortBy(_._2).map(_._3).toSeq
    assert(fo.drop(1).intersect(fn).isEmpty,
      "fixed-stride chunks should all shift under a 3-token insertion")
  }
}
