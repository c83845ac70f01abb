package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.sources.Ingest

/** Runnable end-to-end demo of the reference workload on this engine:
  * synthesizes labeled "tweets" from the documents table into envelope
  * files (the reference's socket payload format), streams them through
  * the file source, and incrementally trains PA-I with per-batch holdout
  * metrics — the complete EP1 pipeline
  * (`runMain graft.streaming.TrainMain [outDir] [sfDir]`).
  *
  * Swap `Ingest.socketLines(spark, host, port)` for the file source to
  * run against a live socket exactly like `SGDC/sgdc.py:166`.
  */
object TrainMain {
  def main(args: Array[String]): Unit = {
    val outDir = args.lift(0).getOrElse("/tmp/graft_train")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${math.min(Runtime.getRuntime.availableProcessors, 32)}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // synthesize envelope files: label 4 iff the doc mentions "fast",
    // a learnable signal over the synthetic vocabulary
    val inDir = s"$outDir/input"
    new java.io.File(inDir).mkdirs()
    val docs = graft.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    docs.grouped(100).zipWithIndex.foreach { case (batch, i) =>
      val recs = batch.map { t =>
        val label = if (t.contains("fast")) "4" else "0"
        val body = t.replace("\"", "").replace("\\", "")
        s""""$label,$body""""
      }
      Files.writeString(Paths.get(s"$inDir/batch$i.json"),
        recs.mkString("[", ",", "]") + "\n")
    }

    val records = Ingest.decodeEnvelope(spark.readStream.text(inDir))
    val query = Run.trainingStream(records, Run.Pa, outDir,
      tag = "demo", stem = true, triggerMs = 1000L, consoleSample = true)
    query.processAllAvailable()
    query.stop()

    println("=== metrics CSV ===")
    Files.readAllLines(Paths.get(s"$outDir/stats_demo.csv")).forEach(println)
    spark.stop()
  }
}
