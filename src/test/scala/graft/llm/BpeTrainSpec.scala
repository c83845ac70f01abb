package graft.llm

import graft.SparkSpec

/** Distributed BPE training (q131) correctness:
  *  1. sf0.001 — the engine's merge table equals an INDEPENDENT pure-
  *     Scala recomputation of Sennrich BPE written directly against the
  *     parquet (the script's loop, re-derived here rather than shared),
  *     and round 1 is exactly q97's top-1 merge candidate.
  *  2. sf0.01 — the 16 trained merges equal the first 16 entries of the
  *     frozen table scripts/train_bpe_merges.py produced at the same
  *     scale: the distributed trainer reproduces the offline trainer.
  */
class BpeTrainSpec extends SparkSpec {

  /** The script's argmax key: highest count, then the flattened pair
    * smallest by negated-ordinal list order (strict prefixes rank AFTER
    * their extensions — the sentinel models the list-length rule). */
  private def better(x: ((String, String), Long), y: ((String, String), Long)): Boolean = {
    val ((xa, xb), xc) = x; val ((ya, yb), yc) = y
    if (xc != yc) xc > yc
    else {
      val xs = xa + xb + "\uffff"; val ys = ya + yb + "\uffff"
      if (xs != ys) xs < ys else xa < ya
    }
  }

  /** Pure driver-side Sennrich BPE over the raw parquet — no engine
    * code paths shared with BpeTrain beyond the data itself. */
  private def brute(dir: String, rounds: Int): Seq[(String, String, Long)] = {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    var vocab = scala.collection.mutable.Map.empty[Vector[String], Long]
    texts.foreach { t =>
      t.trim.split("\\s+").filter(_.nonEmpty).foreach { w =>
        val k = w.map(_.toString).toVector
        vocab(k) = vocab.getOrElse(k, 0L) + 1L
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) = pairs.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (pairs.nonEmpty) {
        val best = pairs.toSeq.reduceLeft((p, q) => if (better(p, q)) p else q)
        val ((a, b), c) = best
        out += ((a, b, c))
        vocab = vocab.foldLeft(
          scala.collection.mutable.Map.empty[Vector[String], Long]) {
          case (m, (syms, cnt)) =>
            val k = BpeTrain.applyMerge(syms.toArray, a, b).toVector
            m(k) = m.getOrElse(k, 0L) + cnt; m
        }
      }
    }
    out.toSeq
  }

  test("sf0.001: trained merges equal the driver brute; round 1 == q97 top pair") {
    val got = BpeTrain.train(spark, sfDir)
    val exp = brute(sfDir, BpeTrain.Rounds)
    assert(got == exp, s"engine merges\n$got\ndiffer from brute\n$exp")

    val q97Top = graft.queries.TextStatsQueries.bpePairs(spark, sfDir)
      .collect().head
    assert(q97Top.getAs[Long]("rnk") == 1L)
    assert(got.head._1 + got.head._2 == q97Top.getAs[String]("pair"),
      "round-1 merge must be q97's top-1 candidate")
    assert(got.head._3 == q97Top.getAs[Long]("cnt"),
      "round-1 merge count must equal q97's top-1 count")
  }

  test("sf0.01: the 16 trained merges equal the frozen script table's head") {
    val got = BpeTrain.train(spark, "/root/testdata/sf0.01").map(m => (m._1, m._2))
    assert(got == Bpe.merges.take(16),
      "distributed trainer diverges from scripts/train_bpe_merges.py")
  }
}
