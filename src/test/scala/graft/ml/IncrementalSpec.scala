package graft.ml

import org.apache.spark.ml.linalg.Vectors
import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4

  /** Linearly separable toy set: class 1 lives on features {0,1},
    * class 0 on features {2,3}. */
  private def toyBatch(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val rows = (1 to n).map { _ =>
      if (rnd.nextBoolean())
        (Vectors.sparse(dim, Array(0, 1), Array(1.0 + rnd.nextDouble(), 1.0)), 1.0)
      else
        (Vectors.sparse(dim, Array(2, 3), Array(1.0 + rnd.nextDouble(), 1.0)), 0.0)
    }
    rows.toDF("tf", "target")
  }

  test("SGD hinge separates the toy set after a few batches") {
    val m = new Incremental.LinearModel(dim)
    for (b <- 1 to 5) Incremental.SgdHinge.partialFit(m, toyBatch(200, b))
    val metrics = Metrics.binaryCollect(m.predictCol(toyBatch(200, 99)))
    assert(metrics.accuracy == 1.0, s"accuracy=${metrics.accuracy}")
  }

  test("PA-I separates the toy set after one batch") {
    val m = new Incremental.LinearModel(dim)
    Incremental.PassiveAggressive.partialFit(m, toyBatch(200, 1))
    val metrics = Metrics.binaryCollect(m.predictCol(toyBatch(200, 99)))
    assert(metrics.accuracy == 1.0, s"accuracy=${metrics.accuracy}")
  }

  test("BernoulliNB counts match hand computation and merge across batches") {
    val nb = new Incremental.BernoulliNB(dim)
    nb.partialFit(Seq(
      (Vectors.sparse(dim, Array(0), Array(1.0)), 1.0),
      (Vectors.sparse(dim, Array(0, 1), Array(1.0, 1.0)), 1.0),
      (Vectors.sparse(dim, Array(2), Array(1.0)), 0.0)).toDF("tf", "target"))
    nb.partialFit(Seq(
      (Vectors.sparse(dim, Array(1), Array(1.0)), 1.0),
      (Vectors.sparse(dim, Array(2, 3), Array(1.0, 1.0)), 0.0)).toDF("tf", "target"))
    assert(nb.classCount.toSeq == Seq(2L, 3L))
    assert(nb.featureCount(1).toSeq == Seq(2L, 2L, 0L, 0L))
    assert(nb.featureCount(0).toSeq == Seq(0L, 0L, 2L, 1L))
  }

  test("BernoulliNB linear form classifies the toy set") {
    val nb = new Incremental.BernoulliNB(dim)
    nb.partialFit(toyBatch(300, 7))
    val metrics = Metrics.binaryCollect(nb.toLinear.predictCol(toyBatch(200, 99)))
    assert(metrics.accuracy == 1.0, s"accuracy=${metrics.accuracy}")
  }

  test("mini-batch k-means recovers the two toy clusters") {
    val km = new Incremental.MiniBatchKMeans(k = 2, dim = dim)
    for (b <- 1 to 3) km.partialFit(toyBatch(200, b))
    // all class-1 points land in one cluster, all class-0 in the other
    val scored = km.predictCol(toyBatch(200, 99))
      .select("target", "prediction").as[(Double, Double)].collect()
    val byLabel = scored.groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSeq)
    assert(byLabel(1.0).size == 1 && byLabel(0.0).size == 1)
    assert(byLabel(1.0).head != byLabel(0.0).head)
  }
}
