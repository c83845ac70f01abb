package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Stream-static join: an unbounded stream enriched against a static
  * (parquet) dimension — Spark plans the dimension as an ordinary
  * batch side inside every micro-batch, so at scale it broadcasts and
  * the stream never shuffles. The standard enrichment shape for a
  * 100 TB event stream against reference data. */
class StreamStaticJoinSpec extends SparkSpec {
  import spark.implicits._

  test("streaming events enrich against the static nation dimension") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Double)] // (nationkey, amount)
    val events = stream.toDS().toDF("nationkey", "amount")
    val dim = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"))
    val enriched = events.join(broadcast(dim),
      col("nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("amount"))
    val q = enriched.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      stream.addData((0L, 10.0), (1L, 20.0), (99L, 5.0)) // 99: no dim row → dropped
      q.processAllAvailable()
      stream.addData((0L, 7.0))
      q.processAllAvailable()
      val rows = spark.table("ss_join").as[(String, Double)].collect().toSet
      assert(rows.map(_._2) == Set(10.0, 20.0, 7.0),
        s"inner join must drop the unmatched key, saw $rows")
      assert(rows.forall(_._1.nonEmpty))
    } finally q.stop()
  }
}
