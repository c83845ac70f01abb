package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** `Dataset.observe` metrics arrive in each batch's
  * StreamingQueryProgress without a second pass over the data. */
class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("observed curation metrics surface per batch in query progress") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val docs = stream.toDS().toDF("doc_id", "text")
    val q = Observe.curationMetrics(docs)
      .writeStream.format("memory").queryName("observe_sink")
      .outputMode("append").start()
    try {
      stream.addData((1L, "a decent little document with several words"),
        (2L, "spam spam spam spam"))
      q.processAllAvailable()
      val metrics = q.recentProgress
        .flatMap(p => Option(p.observedMetrics.get(Observe.MetricsName)))
      assert(metrics.nonEmpty, "expected observed metrics in progress")
      val m = metrics.last
      assert(m.getAs[Long]("n_rows") == 2L)
      assert(m.getAs[Long]("null_texts") == 0L)
      val mq = m.getAs[Double]("mean_quality")
      assert(mq > 0.0 && mq < 1.0, s"mean quality out of range: $mq")
    } finally q.stop()
  }
}
