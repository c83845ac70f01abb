package graft.ml

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of `Array[Float]` embedding columns as a typed
  * `Aggregator` — the engine's UDAF surface (SURVEY §2.8): the same
  * partial-aggregate/merge contract the incremental learners use via
  * treeAggregate, but packaged as a Catalyst aggregate function usable
  * in `agg(...)` (map-side combine comes free from the Aggregator
  * protocol: reduce runs per partition, merge across).
  */
object VectorMean extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(acc: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    val (sums, n) = acc
    val s = if (sums.isEmpty) new Array[Double](v.length) else sums
    var i = 0
    while (i < v.length && i < s.length) { s(i) += v(i); i += 1 }
    (s, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(acc: (Array[Double], Long)): Array[Double] =
    if (acc._2 == 0) Array.empty else acc._1.map(_ / acc._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
