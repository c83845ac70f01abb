package graft.llm

import graft.SparkSpec

/** Correctness evidence for the q99 BPE apply path (rows-only in the
  * DuckDB harness — the merge loop is not SQL-expressible): algorithm
  * goldens on hand-computed tables, frozen-table invariants over every
  * real token, merge-table provenance vs q97's objective, and a full
  * independent Scala recomputation of the q99 query output.
  */
class BpeSpec extends SparkSpec {

  private def table(ps: (String, String)*): (Map[(String, String), Int], Vector[(String, String)]) =
    (ps.zipWithIndex.toMap, ps.toVector)

  test("golden: chained merges compose left to right") {
    val (rk, tbl) = table(("a", "b"), ("ab", "c"))
    // ab merges first everywhere, then abc
    assert(Bpe.encodeWith("abcabc", rk, tbl).toSeq == Seq("abc", "abc"))
    assert(Bpe.encodeWith("ababc", rk, tbl).toSeq == Seq("ab", "abc"))
  }

  test("golden: earlier-trained merge wins over a later one") {
    val (rk, tbl) = table(("b", "c"), ("a", "b"))
    // (b,c) has rank 0, so "abc" -> a|bc, and (a,bc) is not in the table
    assert(Bpe.encodeWith("abc", rk, tbl).toSeq == Seq("a", "bc"))
  }

  test("golden: overlapping occurrences rewrite left to right") {
    val (rk, tbl) = table(("a", "a"))
    assert(Bpe.encodeWith("aaa", rk, tbl).toSeq == Seq("aa", "a"))
    assert(Bpe.encodeWith("aaaa", rk, tbl).toSeq == Seq("aa", "aa"))
  }

  test("golden: no applicable merge leaves single characters; empty stays empty") {
    val (rk, tbl) = table(("x", "y"))
    assert(Bpe.encodeWith("abc", rk, tbl).toSeq == Seq("a", "b", "c"))
    assert(Bpe.encodeWith("", rk, tbl).isEmpty)
    assert(Bpe.encodeWith("a", rk, tbl).toSeq == Seq("a"))
  }

  test("frozen table: every sf0.001 token round-trips (pieces concatenate back)") {
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).trim.split("\\s+")).filter(_.nonEmpty)
    assert(toks.nonEmpty)
    var merged = 0
    for (t <- toks) {
      val p = Bpe.encode(t)
      assert(p.mkString("") == t, s"round-trip failed for '$t'")
      assert(p.forall(_.nonEmpty), s"empty piece for '$t'")
      if (p.length < t.length) merged += 1
    }
    assert(merged > 0, "the frozen table must actually merge real corpus tokens")
  }

  test("provenance: the first frozen merge is q97's top pair at the training scale") {
    // independent recomputation of q97's objective (adjacent char-pair
    // frequency) over the sf0.01 training slice
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).trim.split("\\s+")).filter(_.nonEmpty)
      .foreach { t =>
        for (i <- 0 until t.length - 1) {
          val k = (t.substring(i, i + 1), t.substring(i + 1, i + 2))
          counts(k) = counts.getOrElse(k, 0L) + 1L
        }
      }
    // tie-break irrelevant in practice: assert by count dominance
    val best = counts.toSeq.sortBy { case (_, c) => -c }
    assert(Bpe.merges.head == best.head._1 ||
      best.take(2).map(_._1).contains(Bpe.merges.head),
      s"first merge ${Bpe.merges.head} not among top pairs ${best.take(2)}")
    assert(counts(Bpe.merges.head) == best.head._2,
      "first merge must carry the maximal pair count")
  }

  // q99's independent-recomputation parity moved to BpeServeSpec: the
  // apply path now serves the in-engine-trained table, so the brute arm
  // must train live rather than reuse the frozen snapshot.
}
