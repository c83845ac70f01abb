package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamEmbedDedup, StreamNearDup}

/** Property-style fuzz tests for the hash families backing the
  * dedup/ANN paths — pure Scala (no SparkSession), hundreds of seeded
  * random cases per property (same house pattern as CleanPropertySpec).
  */
class HashPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812L)
  private def word(): String =
    (1 to 1 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  private def text(): String =
    (1 to 1 + rnd.nextInt(30)).map(_ => word()).mkString(" ")

  test("minhash permutation parameters are in range and collision-free") {
    assert(Dedup.Perms.length == Dedup.MinHashK)
    Dedup.Perms.foreach { case (a, b) =>
      assert(a >= 1 && a < Dedup.MinHashP && b >= 0 && b < Dedup.MinHashP)
    }
    assert(Dedup.Perms.distinct.length == Dedup.MinHashK, "no duplicate permutations")
  }

  test("streaming signature: deterministic, order/multiplicity-insensitive, estimator in [0,1]") {
    for (_ <- 1 to 300) {
      val a = text(); val b = text()
      val sa = StreamNearDup.signature(a)
      assert(sa == StreamNearDup.signature(a)) // deterministic
      // token-SET semantics: order and duplication don't matter
      val words = a.split("\\s+").toSeq
      val shuffled = (rnd.shuffle(words) ++ words).mkString(" ")
      assert(StreamNearDup.signature(shuffled) == sa)
      val est = StreamNearDup.estJaccard(sa, StreamNearDup.signature(b))
      assert(est >= 0.0 && est <= 1.0)
      assert(StreamNearDup.estJaccard(sa, sa) == 1.0)
      assert(sa.forall(h => h >= -1 && h < Dedup.MinHashP))
    }
  }

  test("band keys: one per band, band-prefixed, stable") {
    for (_ <- 1 to 300) {
      val keys = StreamNearDup.bandKeys(StreamNearDup.signature(text()))
      assert(keys.length == Dedup.Bands && keys.distinct.length == keys.length)
      assert(keys.zipWithIndex.forall { case (k, i) => k.startsWith(s"$i|") })
    }
  }

  test("embedding buckets: deterministic and scale-invariant (sign function)") {
    for (_ <- 1 to 200) {
      val v = List.fill(VectorOps.Dim)(rnd.nextDouble() * 2 - 1)
      val s = 0.5 + rnd.nextDouble() * 9.5
      val b = StreamEmbedDedup.buckets(v)
      assert(b == StreamEmbedDedup.buckets(v))
      // positive scaling never flips a sign bit
      assert(StreamEmbedDedup.buckets(v.map(_ * s)) == b)
    }
  }

  test("jaccard estimator tracks true jaccard within MinHash noise on shared-token texts") {
    for (_ <- 1 to 100) {
      val base = (1 to 30).map(_ => word()).distinct
      if (base.size >= 10) {
        val keep = base.size / 2
        val a = base.mkString(" ")
        val b = (base.take(keep) ++ (1 to 10).map(_ => word() + "zz")).mkString(" ")
        val ta = a.split(" ").toSet
        val tb = b.split(" ").toSet
        val trueJ = (ta & tb).size.toDouble / (ta | tb).size
        val est = StreamNearDup.estJaccard(
          StreamNearDup.signature(a), StreamNearDup.signature(b))
        // k=16 → σ = sqrt(J(1−J)/16) ≈ 0.125; allow 4σ
        assert(math.abs(est - trueJ) <= 0.5,
          f"est=$est%.2f trueJ=$trueJ%.2f drifted beyond MinHash noise")
      }
    }
  }
}
