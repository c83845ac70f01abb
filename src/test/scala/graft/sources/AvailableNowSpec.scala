package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** `Trigger.AvailableNow` — the bounded-backfill lifecycle: process
  * everything currently in the source in rate-limited batches, then
  * stop on its own. This is how a 100 TB historical backfill runs
  * through the SAME streaming query as the live stream (identical
  * semantics + checkpoint), instead of a separately-written batch job.
  */
class AvailableNowSpec extends SparkSpec {
  import spark.implicits._

  test("AvailableNow drains a file source in rate-limited batches and self-terminates") {
    val srcDir = Files.createTempDirectory("graft_an_src").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft_an_ck").toFile.getAbsolutePath
    // three files → with maxFilesPerTrigger=1, three bounded batches
    (1 to 3).foreach { i =>
      Seq.tabulate(10)(j => s"doc-$i-$j").toDF("value")
        .coalesce(1).write.mode("append").text(srcDir)
    }
    val stream = spark.readStream
      .option("maxFilesPerTrigger", "1")
      .text(srcDir)
    val q = stream.writeStream.format("memory").queryName("an_sink")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .outputMode("append").start()
    // self-terminates once the backlog is drained
    assert(q.awaitTermination(120000), "AvailableNow query must stop on its own")
    assert(spark.table("an_sink").count() == 30)
    val batches = q.recentProgress.count(_.numInputRows > 0)
    assert(batches >= 3, s"expected >= 3 rate-limited batches, saw $batches")
  }
}
