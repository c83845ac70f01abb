package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Idempotent foreachBatch parquet sink via DYNAMIC partition overwrite:
  * each micro-batch writes `mode(overwrite)` into its own batch_id
  * partition, so an at-least-once REPLAY of a batch overwrites its own
  * partition instead of appending duplicates — the standard
  * exactly-once-effect file-sink recipe when the built-in file sink's
  * commit log can't be used (e.g. when also writing to other systems).
  */
class IdempotentSinkSpec extends SparkSpec {
  import spark.implicits._

  test("replaying a batch overwrites its own partition, never duplicates") {
    val out = Files.createTempDirectory("graft_idem").toFile.getAbsolutePath
    val prior = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(Long, String)]
      def writeBatch(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit =
        df.withColumn("batch_id", lit(batchId))
          .write.partitionBy("batch_id")
          .mode("overwrite").parquet(out)
      val q = stream.toDS().toDF("id", "payload").writeStream
        .foreachBatch(writeBatch _).start()
      try {
        stream.addData((1L, "a"), (2L, "b"))
        q.processAllAvailable()
        stream.addData((3L, "c"))
        q.processAllAvailable()
        assert(spark.read.parquet(out).count() == 3)
        // simulate an at-least-once redelivery of batch 1
        writeBatch(Seq((3L, "c")).toDF("id", "payload"), 1L)
        val after = spark.read.parquet(out)
        assert(after.count() == 3, "replay must not duplicate rows")
        assert(after.where(col("batch_id") === 0).count() == 2)
      } finally q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
