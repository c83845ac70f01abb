package graft.queries

import graft.SparkSpec

/** Measures the approximate paths against brute-force ground truth —
  * the numbers that justify calling q32/q55 "scale paths": they trade
  * bounded recall loss for join cost that no longer grows quadratically.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  // measured at sf0.01 (500 vectors) — denser than the sf0.001 smoke set,
  // closer to the bucket occupancy the approximate paths are tuned for
  private val dir = "/root/testdata/sf0.01"

  private def topk(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

  private lazy val truth = topk(SimilarityQueries.knnBrute(spark, dir))

  test("IVF (8 probes over 32 trained cells) keeps recall@5 above 80%") {
    // trained (frozen k-means) codebook: measured 0.83 examining ~27%
    // of the corpus — the first-16-vectors scaffold sat at 0.66.
    val got = topk(SimilarityQueries.knnIvf(spark, dir))
    val recall = (truth & got).size.toDouble / truth.size
    info(f"IVF recall@5 = $recall%.3f")
    assert(recall >= 0.8, f"recall=$recall%.3f")
  }

  test("multi-table random-hyperplane LSH keeps recall@5 above 60%") {
    // 6 tables × 10 random-projection bits, Hamming≤2 multi-probe:
    // measured 0.69 examining ~29% of the corpus (the old single-table
    // axis-aligned 8-bit code managed 0.14).
    val got = topk(SimilarityQueries.knnLsh(spark, dir))
    val recall = (truth & got).size.toDouble / truth.size
    info(f"LSH recall@5 = $recall%.3f")
    assert(recall >= 0.6, f"recall=$recall%.3f")
  }

  test("LSH near-dup pairs are a subset of brute-force pairs") {
    val brute = SimilarityQueries.embedNearDup(spark, sfDir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lsh = SimilarityQueries.embedNearDupLsh(spark, sfDir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
  }

  test("MinHash-LSH near-dup (q27) achieves full recall vs brute q25 here") {
    val brute = DedupQueries.ngramJaccard(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = DedupQueries.minhashNearDup(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh == brute) // J≥0.5 pairs almost surely collide in ≥1 of 4 bands
  }
}
