package graft.ml

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.{col, udf}

/** Incremental ("partial_fit") learners mirroring the reference's four
  * sklearn estimators (SURVEY §2.8 M1–M4), re-hosted on Spark.
  *
  * Execution model: the featurized micro-batch stays distributed; each
  * update is one `treeAggregate` that reduces the batch to
  * gradient/count-sized state (≤ a few × 2500 doubles), which the driver
  * folds into the model — the exact inversion of the reference, which
  * `collect()`s the whole batch to the driver as a dense numpy matrix
  * (`SGDC/sgdc.py:75-78`, ~60 MB per 3000-row batch) and trains there.
  * At 100 TB only weight-vector-sized state ever crosses the wire.
  *
  * Parity is semantic, not bitwise (SURVEY §5.3): sklearn applies
  * per-sample sequential updates inside a batch; a distributed engine
  * cannot order samples without serializing, so these use the standard
  * mini-batch formulation (one aggregated step per micro-batch).
  * Acceptance: convergence/distribution tests, never pkl equality.
  */
object Incremental {

  /** Dense weights + intercept; the only mutable driver-side state. */
  final class LinearModel(val dim: Int) extends Serializable {
    val w: Array[Double] = new Array[Double](dim)
    var b: Double = 0.0
    var t: Long = 0L // samples seen

    def margin(v: Vector): Double = {
      var s = b
      v.foreachActive((i, x) => s += w(i) * x)
      s
    }

    /** Scoring as a column: sign of the (broadcast) linear form — the
      * reference's M6 `model.predict` (`SGDC/sgdc.py:97`). */
    def predictCol(scored: DataFrame, featuresCol: String = "tf"): DataFrame = {
      val wl = w.clone(); val bl = b
      val p = udf { v: Vector =>
        var s = bl; v.foreachActive((i, x) => s += wl(i) * x)
        if (s > 0) 1.0 else 0.0
      }
      scored.withColumn("prediction", p(col(featuresCol)))
    }
  }

  private def rows(batch: DataFrame): org.apache.spark.rdd.RDD[(Vector, Double)] =
    batch.select(col("tf"), col("target")).rdd
      .map { case Row(v: Vector, y: Double) => (v, y) }

  /** M1 — incremental hinge-loss SGD with L2, mirroring
    * `SGDClassifier(loss='hinge', penalty='l2', learning_rate='optimal')`
    * (`SGDC/sgdc.py:154`). One averaged subgradient step per batch with
    * sklearn's 'optimal' eta = 1/(alpha*(t0+t)).
    */
  object SgdHinge {
    val Alpha = 1e-4
    val T0 = 1e3 // Bottou heuristic scale; sklearn derives it from the data

    /** One partial_fit step; labels must be ±-encoded as {0.0, 1.0}. */
    def partialFit(m: LinearModel, batch: DataFrame): Unit = {
      val dim = m.dim
      val (gradW, gradB, n) = rows(batch).treeAggregate(
        (new Array[Double](dim), 0.0, 0L))(
        seqOp = { case ((gw, gb, c), (v, y01)) =>
          val y = if (y01 > 0.5) 1.0 else -1.0
          val wl = m.w // serialized into the closure once per batch
          var s = m.b
          v.foreachActive((i, x) => s += wl(i) * x)
          if (y * s < 1.0) {
            v.foreachActive((i, x) => gw(i) -= y * x)
            (gw, gb - y, c + 1)
          } else (gw, gb, c + 1)
        },
        combOp = { case ((g1, b1, c1), (g2, b2, c2)) =>
          var i = 0
          while (i < dim) { g1(i) += g2(i); i += 1 }
          (g1, b1 + b2, c1 + c2)
        })
      if (n > 0) {
        m.t += n
        val eta = 1.0 / (Alpha * (T0 + m.t))
        var i = 0
        while (i < dim) {
          m.w(i) -= eta * (gradW(i) / n + Alpha * m.w(i))
          i += 1
        }
        m.b -= eta * (gradB / n)
      }
    }
  }

  /** M2 — Passive-Aggressive I, mirroring
    * `PassiveAggressiveClassifier(C=1.0)` (`PAC/passiveAgressiveModel
    * .py:154`): per-sample tau = min(C, loss/||x||²), averaged over the
    * batch's margin violators.
    */
  object PassiveAggressive {
    val C = 1.0

    def partialFit(m: LinearModel, batch: DataFrame): Unit = {
      val dim = m.dim
      val (upW, upB, nViol, n) = rows(batch).treeAggregate(
        (new Array[Double](dim), 0.0, 0L, 0L))(
        seqOp = { case ((uw, ub, nv, c), (v, y01)) =>
          val y = if (y01 > 0.5) 1.0 else -1.0
          val wl = m.w
          var s = m.b
          var sq = 1.0 // intercept extends x with a constant 1 feature
          v.foreachActive { (i, x) => s += wl(i) * x; sq += x * x }
          val loss = 1.0 - y * s
          if (loss > 0.0) {
            val tau = math.min(C, loss / sq)
            v.foreachActive((i, x) => uw(i) += tau * y * x)
            (uw, ub + tau * y, nv + 1, c + 1)
          } else (uw, ub, nv, c + 1)
        },
        combOp = { case ((u1, b1, v1, c1), (u2, b2, v2, c2)) =>
          var i = 0
          while (i < dim) { u1(i) += u2(i); i += 1 }
          (u1, b1 + b2, v1 + v2, c1 + c2)
        })
      if (nViol > 0) {
        m.t += n
        var i = 0
        while (i < dim) { m.w(i) += upW(i) / nViol; i += 1 }
        m.b += upB / nViol
      }
    }
  }

  /** M3 — incremental Bernoulli naive Bayes (`BernoulliNB()` —
    * `BNB/latest_Bnb.py:164`). State is pure counts, which merge exactly
    * across batches — the one estimator whose incremental semantics are
    * IDENTICAL to sklearn's (count accumulation is order-free).
    */
  final class BernoulliNB(val dim: Int, val alpha: Double = 1.0)
    extends Serializable {
    val classCount = new Array[Long](2)
    val featureCount: Array[Array[Long]] = Array.ofDim[Long](2, dim)

    def partialFit(batch: DataFrame): Unit = {
      val d = dim
      val (fc0, fc1, c0, c1) = rows(batch).treeAggregate(
        (new Array[Long](d), new Array[Long](d), 0L, 0L))(
        seqOp = { case ((f0, f1, n0, n1), (v, y)) =>
          val f = if (y > 0.5) f1 else f0
          v.foreachActive((i, x) => if (x > 0.0) f(i) += 1)
          if (y > 0.5) (f0, f1, n0, n1 + 1) else (f0, f1, n0 + 1, n1)
        },
        combOp = { case ((a0, a1, x0, x1), (b0, b1, y0, y1)) =>
          var i = 0
          while (i < d) { a0(i) += b0(i); a1(i) += b1(i); i += 1 }
          (a0, a1, x0 + y0, x1 + y1)
        })
      var i = 0
      while (i < dim) {
        featureCount(0)(i) += fc0(i); featureCount(1)(i) += fc1(i); i += 1
      }
      classCount(0) += c0; classCount(1) += c1
    }

    /** Collapse to a linear decision rule (log-odds of Bernoulli NB are
      * linear in binarized features), reusing LinearModel scoring. */
    def toLinear: LinearModel = {
      val m = new LinearModel(dim)
      val n0 = classCount(0).toDouble; val n1 = classCount(1).toDouble
      if (n0 > 0 || n1 > 0) {
        var bias = math.log((n1 + alpha) / (n0 + alpha))
        var i = 0
        while (i < dim) {
          val p1 = (featureCount(1)(i) + alpha) / (n1 + 2 * alpha)
          val p0 = (featureCount(0)(i) + alpha) / (n0 + 2 * alpha)
          m.w(i) = math.log(p1 / (1 - p1)) - math.log(p0 / (1 - p0))
          bias += math.log((1 - p1) / (1 - p0))
          i += 1
        }
        m.b = bias
      }
      m
    }
  }

  /** M4 — mini-batch k-means (`MiniBatchKMeans(n_clusters=2,
    * batch_size=2048)` — `KMEANS CLUSTERING/kmeans.py:155-157`):
    * per-batch assignment + per-center running-mean update with
    * per-center counts as the learning-rate schedule.
    */
  final class MiniBatchKMeans(val k: Int, val dim: Int) extends Serializable {
    val centers: Array[Array[Double]] = Array.ofDim[Double](k, dim)
    val counts = new Array[Long](k)
    private var initialized = false

    def assign(v: Vector): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val ctr = centers(c)
        var d = 0.0
        // ||v - ctr||² = ||v||² - 2 v·ctr + ||ctr||²; sparse-friendly:
        var dotVC = 0.0; var vv = 0.0
        v.foreachActive { (i, x) => dotVC += x * ctr(i); vv += x * x }
        var cc = 0.0
        var i = 0
        while (i < dim) { cc += ctr(i) * ctr(i); i += 1 }
        d = vv - 2 * dotVC + cc
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    def partialFit(batch: DataFrame): Unit = {
      val vecs = batch.select(col("tf")).rdd.map { case Row(v: Vector) => v }
      if (!initialized) {
        // deterministic init: the first k DISTINCT vectors of the first
        // batch (scanning forward past duplicates — duplicate seeds would
        // pin two centers to the same point and degenerate clustering).
        // Oversample 4k rows before deduping; if the stream's head has
        // fewer than k distinct vectors the remaining centers stay at the
        // origin and are claimed by later batches.
        val init = vecs.take(math.max(k * 4, k))
          .map(_.toArray.toSeq).distinct.take(k)
        for (c <- init.indices; (x, i) <- init(c).zipWithIndex)
          centers(c)(i) = x
        initialized = true
      }
      val self = this
      val (sums, ns) = vecs.treeAggregate(
        (Array.ofDim[Double](k, dim), new Array[Long](k)))(
        seqOp = { case ((s, n), v) =>
          val c = self.assign(v)
          v.foreachActive((i, x) => s(c)(i) += x)
          n(c) += 1
          (s, n)
        },
        combOp = { case ((s1, n1), (s2, n2)) =>
          var c = 0
          while (c < k) {
            var i = 0
            while (i < dim) { s1(c)(i) += s2(c)(i); i += 1 }
            n1(c) += n2(c); c += 1
          }
          (s1, n1)
        })
      var c = 0
      while (c < k) {
        if (ns(c) > 0) {
          counts(c) += ns(c)
          val eta = ns(c).toDouble / counts(c)
          val mean = sums(c)
          var i = 0
          while (i < dim) {
            centers(c)(i) = (1 - eta) * centers(c)(i) + eta * (mean(i) / ns(c))
            i += 1
          }
        }
        c += 1
      }
    }

    def predictCol(df: DataFrame, featuresCol: String = "tf"): DataFrame = {
      val snapshot = centers.map(_.clone())
      val d = dim; val kk = k
      val p = udf { v: Vector =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kk) {
          val ctr = snapshot(c)
          var dotVC = 0.0; var vv = 0.0
          v.foreachActive { (i, x) => dotVC += x * ctr(i); vv += x * x }
          var cc = 0.0; var i = 0
          while (i < d) { cc += ctr(i) * ctr(i); i += 1 }
          val dist = vv - 2 * dotVC + cc
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        best.toDouble
      }
      df.withColumn("prediction", p(col(featuresCol)))
    }
  }
}
