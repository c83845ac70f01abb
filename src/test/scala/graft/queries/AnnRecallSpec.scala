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

  test("IVF (4 probes over 16 cells) keeps recall above 60%") {
    val got = topk(SimilarityQueries.knnIvf(spark, dir))
    val recall = (truth & got).size.toDouble / truth.size
    info(f"IVF recall@5 = $recall%.3f")
    assert(recall >= 0.6, f"recall=$recall%.3f")
  }

  test("multi-probe sign-LSH recall beats its candidate-set fraction by >2x") {
    // 9 probed buckets of 256 examine ~3.5% of the corpus per query;
    // measured recall ~14% ≈ 4× better than random candidates of the
    // same size. Absolute recall rises with corpus density (more
    // bucket-mates per probe) — the 8-bit code is a pruning dial, not a
    // precision knob.
    val got = topk(SimilarityQueries.knnLsh(spark, dir))
    val recall = (truth & got).size.toDouble / truth.size
    info(f"LSH recall@5 = $recall%.3f")
    assert(recall >= 0.10, f"recall=$recall%.3f")
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
