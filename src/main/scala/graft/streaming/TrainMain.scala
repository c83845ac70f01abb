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
    // SPARK_GRAFT_CPUS=2 reproduces the reference's local[2] exactly
    // (1 core receiver + 1 core tasks, BASELINE.md) for a like-for-like
    // throughput comparison.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // synthesize envelope files: label 4 iff the doc mentions "fast",
    // a learnable signal over the synthetic vocabulary. One file per
    // 1000 records — the reference's largest swept batch size — and
    // SPARK_GRAFT_TRAIN_REPEAT replays the corpus k× so steady-state
    // processing dominates stream-startup in the throughput figure.
    val repeat = sys.env.getOrElse("SPARK_GRAFT_TRAIN_REPEAT", "1").toInt
    val inDir = s"$outDir/input"
    new java.io.File(inDir).mkdirs()
    val docs = graft.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val rows = Iterator.range(0, repeat).flatMap(_ => docs.iterator).toSeq
    rows.grouped(1000).zipWithIndex.foreach { case (batch, i) =>
      val recs = batch.map { t =>
        val label = if (t.contains("fast")) "4" else "0"
        val body = t.replace("\"", "").replace("\\", "")
        s""""$label,$body""""
      }
      Files.writeString(Paths.get(s"$inDir/batch$i.json"),
        recs.mkString("[", ",", "]") + "\n")
    }

    val records = Ingest.decodeEnvelope(spark.readStream.text(inDir))
    val t0 = System.nanoTime()
    val query = Run.trainingStream(records, Run.Pa, outDir,
      tag = "demo", stem = true, triggerMs = 100L, consoleSample = true)
    query.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    query.stop()

    println("=== metrics CSV ===")
    Files.readAllLines(Paths.get(s"$outDir/stats_demo.csv")).forEach(println)
    // Throughput vs the reference's structural ceiling: its driver-side
    // partial_fit consumes at most one batch (<= 3000 rows at the largest
    // swept size) per 5 s micro-batch => 600 rows/s, regardless of
    // hardware (BASELINE.md: batch sizes 1000/2000/3000, 5 s interval).
    val rps = rows.length / secs
    println(f"""{"metric":"train_throughput","rows":${rows.length},"seconds":$secs%.2f,"rows_per_sec":$rps%.1f,"reference_ceiling_rows_per_sec":600.0,"cpus":$cpus}""")
    spark.stop()
  }
}
