package graft.ml

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Held-out-quality regression bars for all four incremental models over
  * the FULL text pipeline (clean → tokenize → stop-drop → stem →
  * HashingTF 2500) on noisy synthetic tweets — IncrementalSpec proves
  * convergence on clean 4-dim toys; this catches silent regressions at
  * the realistic feature width with label noise and vocabulary overlap.
  * Everything is seed-fixed, so the bars are deterministic.
  */
class ModelQualitySpec extends SparkSpec {
  import spark.implicits._

  private val pos = Vector("love", "great", "happy", "wonderful", "amazing",
    "excellent", "smile", "enjoy", "fantastic", "delight")
  private val neg = Vector("hate", "awful", "sad", "terrible", "horrible",
    "angry", "cry", "worst", "disgusting", "miserable")
  private val shared = Vector("today", "weather", "commute", "phone", "lunch",
    "meeting", "traffic", "coffee")

  /** n noisy tweets: 5 words from the label's vocabulary, 3 shared words;
    * 10% of LABELS flipped (irreducible noise). */
  private def batch(n: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val positive = rnd.nextBoolean()
      val vocab = if (positive) pos else neg
      val words = Seq.fill(5)(vocab(rnd.nextInt(vocab.size))) ++
        Seq.fill(3)(shared(rnd.nextInt(shared.size)))
      val label = if (rnd.nextDouble() < 0.1) !positive else positive
      (if (label) "4" else "0", words.mkString(" "))
    }.toDF("Label", "Tweet")
  }

  private def heldOut: DataFrame = Featurize.featurize(batch(400, 999))

  private def f1Of(scored: DataFrame): Double = Metrics.binaryCollect(scored).f1

  test("SGD hinge reaches F1 >= 0.8 on noisy held-out data after 5 batches") {
    val m = new Incremental.LinearModel(Featurize.NumFeatures)
    for (b <- 1 to 5)
      Incremental.SgdHinge.partialFit(m, Featurize.featurize(batch(300, b)))
    val f1 = f1Of(m.predictCol(heldOut))
    info(f"SGD held-out F1 = $f1%.3f")
    assert(f1 >= 0.8, f"f1=$f1%.3f")
  }

  test("PA-I reaches F1 >= 0.8 on noisy held-out data after 5 batches") {
    val m = new Incremental.LinearModel(Featurize.NumFeatures)
    for (b <- 1 to 5)
      Incremental.PassiveAggressive.partialFit(m, Featurize.featurize(batch(300, b)))
    val f1 = f1Of(m.predictCol(heldOut))
    info(f"PA-I held-out F1 = $f1%.3f")
    assert(f1 >= 0.8, f"f1=$f1%.3f")
  }

  test("BernoulliNB reaches F1 >= 0.8 on noisy held-out data after 5 batches") {
    val nb = new Incremental.BernoulliNB(Featurize.NumFeatures)
    for (b <- 1 to 5) nb.partialFit(Featurize.featurize(batch(300, b)))
    val f1 = f1Of(nb.toLinear.predictCol(heldOut))
    info(f"BNB held-out F1 = $f1%.3f")
    assert(f1 >= 0.8, f"f1=$f1%.3f")
  }

  test("mini-batch k-means clusters align with sentiment at >= 0.8 purity") {
    val km = new Incremental.MiniBatchKMeans(k = 2, dim = Featurize.NumFeatures)
    for (b <- 1 to 5) km.partialFit(Featurize.featurize(batch(300, b)))
    val scored = km.predictCol(heldOut)
      .select("target", "prediction").as[(Double, Double)].collect()
    // purity under the best cluster→label alignment
    val n = scored.length.toDouble
    val agree = scored.count { case (t, p) => t == p }
    val purity = math.max(agree, scored.length - agree) / n
    info(f"k-means purity = $purity%.3f")
    assert(purity >= 0.8, f"purity=$purity%.3f")
  }
}
