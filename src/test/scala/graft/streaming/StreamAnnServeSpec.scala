package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The live ANN server answers exactly like the batch index: streaming
  * q55's query set through StreamAnnServe (in two micro-batches, out of
  * order) yields row-for-row the q55 result — online serving and
  * offline evaluation agree on every neighbor and every cosine bit.
  */
class StreamAnnServeSpec extends SparkSpec {
  import spark.implicits._

  test("streamed answers equal batch q55 row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ann_serve").toString
    val out = s"$dir/answers"; val ckpt = s"$dir/ckpt"

    // q55's query set: vec_id < 50, as (query_id, qv) rows
    val queries = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qv"))
      .as[(Long, Seq[Double])].collect().toSeq

    val stream = MemoryStream[(Long, Seq[Double])]
    val query = StreamAnnServe.start(
      stream.toDS().toDF("query_id", "qv"), sfDir, out, ckpt)
    try {
      val (late, early) = queries.partition(_._1 % 2 == 0)
      stream.addData(early); query.processAllAvailable()
      stream.addData(late); query.processAllAvailable()
    } finally query.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("rn"))
    val served = spark.read.parquet(out).collect()
      .map(r => key(r) -> ((r.getAs[Long]("neighbor_id"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("cos"))))).toMap
    val batch = graft.SparkEntry.queries("q55_knn_ivf")(spark, sfDir)
      .collect()
      .map(r => key(r) -> ((r.getAs[Long]("neighbor_id"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("cos"))))).toMap
    assert(served.nonEmpty, "witness: the server must answer something")
    assert(served == batch,
      "live ANN answers must equal batch q55 bit-for-bit")
  }
}
