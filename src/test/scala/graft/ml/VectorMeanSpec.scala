package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.col

class VectorMeanSpec extends SparkSpec {
  import spark.implicits._

  test("typed Aggregator computes the element-wise mean with partial merge") {
    val ds = Seq(
      Array(1.0f, 2.0f, 3.0f),
      Array(3.0f, 4.0f, 5.0f),
      Array(5.0f, 6.0f, 7.0f)).toDS().repartition(3) // forces merges
    val mean = ds.select(VectorMean.toColumn).head()
    assert(mean.toSeq == Seq(3.0, 4.0, 5.0))
  }

  test("empty input yields the empty vector") {
    val ds = Seq.empty[Array[Float]].toDS()
    assert(ds.select(VectorMean.toColumn).head().isEmpty)
  }

  test("per-label centroid of the real embeddings table") {
    val centroids = Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding")).as[(Int, Array[Float])]
      .groupByKey(_._1).mapValues(_._2)
      .agg(VectorMean.toColumn.name("centroid"))
      .collect()
    assert(centroids.nonEmpty)
    centroids.foreach { case (_, c) => assert(c.length == 64) }
  }
}
