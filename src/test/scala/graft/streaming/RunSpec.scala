package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.sources.Ingest

class RunSpec extends SparkSpec {
  import spark.implicits._

  private def envelope(recs: Seq[(String, String)]): String =
    recs.map { case (l, t) => s"""\"$l,$t\"""" }.mkString("[", ",", "]")

  test("memory-stream end-to-end: 3 micro-batches train, sink, checkpoint") {
    val outDir = Files.createTempDirectory("graft-stream").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val records = Ingest.decodeEnvelope(stream.toDF())

    val query = Run.trainingStream(records, Run.Pa, outDir,
      tag = "test", stem = false, triggerMs = 50L)
    try {
      val rnd = new scala.util.Random(1)
      for (_ <- 1 to 3) {
        val batch = (1 to 60).map { _ =>
          if (rnd.nextBoolean()) ("4", "good great fine, really nice")
          else ("0", "bad awful, terrible sad")
        }
        stream.addData(envelope(batch))
        query.processAllAvailable()
      }
    } finally query.stop()

    val csv = Files.readAllLines(Paths.get(s"$outDir/stats_test.csv"))
    assert(csv.get(0) == "iter,f1,maxf1,acc,precision,recall,batchsize,mse")
    assert(csv.size() == 4, s"expected 3 metric rows, got ${csv.size() - 1}")
    // best-F1 column is monotone non-decreasing
    val best = (1 to 3).map(i => csv.get(i).split(",")(2).toDouble)
    assert(best == best.sorted)
    // model state checkpoints exist and reload
    val st = Run.loadState(s"$outDir/model_test.bin")
    assert(st.isDefined && st.get.iter == 3)
    // perfectly separable vocabulary → the best checkpoint exists
    assert(Files.exists(Paths.get(s"$outDir/model_bestfsc_test.bin")))
  }

  test("dynamic-label mode (reference T5 refit) trains per-batch mappings") {
    val outDir = Files.createTempDirectory("graft-dyn").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val query = Run.trainingStream(Ingest.decodeEnvelope(stream.toDF()), Run.Pa,
      outDir, tag = "dyn", stem = false, triggerMs = 50L, dynamicLabel = true)
    try {
      stream.addData(envelope((1 to 30).map(i =>
        if (i % 3 == 0) ("4", "good great fine") else ("0", "bad awful sad"))))
      query.processAllAvailable()
    } finally query.stop()
    val csv = Files.readAllLines(Paths.get(s"$outDir/stats_dyn.csv"))
    assert(csv.size() == 2, csv)
    // majority class "0" indexes to 0.0 under frequency order, so the
    // separable vocabulary still trains to perfect holdout accuracy
    assert(csv.get(1).split(",")(3).toDouble == 1.0, csv.get(1))
  }

  test("BNB streaming training accumulates counts and classifies") {
    val outDir = Files.createTempDirectory("graft-bnb").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val query = Run.trainingStream(Ingest.decodeEnvelope(stream.toDF()), Run.Bnb,
      outDir, tag = "bnb", stem = false, triggerMs = 50L)
    try {
      for (_ <- 1 to 2) {
        stream.addData(envelope((1 to 40).map(i =>
          if (i % 2 == 0) ("4", "good great nice") else ("0", "bad awful sad"))))
        query.processAllAvailable()
      }
    } finally query.stop()
    val csv = Files.readAllLines(Paths.get(s"$outDir/stats_bnb.csv"))
    assert(csv.size() == 3)
    // separable vocabulary → second-batch holdout accuracy is perfect
    assert(csv.get(2).split(",")(3).toDouble == 1.0, csv.get(2))
    val st = Run.loadState(s"$outDir/model_bnb.bin").get
    assert(st.model.isInstanceOf[Run.NbState])
    // counts merged across both batches
    assert(st.model.asInstanceOf[Run.NbState].nb.classCount.sum == 64L)
  }

  test("k-means streaming training clusters with alignment-corrected metrics") {
    val outDir = Files.createTempDirectory("graft-km").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val query = Run.trainingStream(Ingest.decodeEnvelope(stream.toDF()), Run.Kmeans,
      outDir, tag = "km", stem = false, triggerMs = 50L)
    try {
      for (_ <- 1 to 2) {
        stream.addData(envelope((1 to 60).map(i =>
          if (i % 2 == 0) ("4", "good great nice fine happy")
          else ("0", "bad awful sad poor gloomy"))))
        query.processAllAvailable()
      }
    } finally query.stop()
    val csv = Files.readAllLines(Paths.get(s"$outDir/stats_km.csv"))
    assert(csv.size() == 3)
    // two disjoint vocabularies → clusters align perfectly with labels
    assert(csv.get(2).split(",")(3).toDouble == 1.0, csv.get(2))
    assert(Run.loadState(s"$outDir/model_km.bin").get.model
      .isInstanceOf[Run.KmState])
  }

  test("inference stream (EP2) scores whole batches with a frozen model") {
    val outDir = Files.createTempDirectory("graft-infer").toString
    implicit val sqlCtx = spark.sqlContext

    // train a model to freeze
    val trainStream = MemoryStream[String]
    val tq = Run.trainingStream(Ingest.decodeEnvelope(trainStream.toDF()), Run.Pa,
      outDir, tag = "frozen", stem = false, triggerMs = 50L)
    try {
      trainStream.addData(envelope((1 to 40).map(i =>
        if (i % 2 == 0) ("4", "good great nice fine") else ("0", "bad awful sad poor"))))
      tq.processAllAvailable()
    } finally tq.stop()

    // frozen inference on a fresh stream
    val inferStream = MemoryStream[String]
    val iq = Run.inferenceStream(Ingest.decodeEnvelope(inferStream.toDF()),
      s"$outDir/model_frozen.bin", outDir, tag = "t", stem = false, triggerMs = 50L)
    try {
      inferStream.addData(envelope(Seq(("4", "good great"), ("0", "bad awful"))))
      iq.processAllAvailable()
    } finally iq.stop()

    val csv = Files.readAllLines(Paths.get(s"$outDir/infer_t.csv"))
    assert(csv.get(0) == "batch,f1,acc,precision,recall,n,mse")
    assert(csv.size() == 2)
    // separable vocabulary scored by the trained model → perfect accuracy
    assert(csv.get(1).split(",")(2).toDouble == 1.0)
    // no model files written by inference
    assert(!Files.exists(Paths.get(s"$outDir/model_t.bin")))
  }

  test("restart resumes iteration counter and weights from disk") {
    val outDir = Files.createTempDirectory("graft-stream2").toString
    implicit val sqlCtx = spark.sqlContext

    val s1 = MemoryStream[String]
    val q1 = Run.trainingStream(Ingest.decodeEnvelope(s1.toDF()), Run.Sgd,
      outDir, tag = "r", stem = false, triggerMs = 50L)
    try {
      s1.addData(envelope(Seq(("4", "good nice"), ("0", "bad sad"),
        ("4", "great fine"), ("0", "awful poor"))))
      q1.processAllAvailable()
    } finally q1.stop()
    val after1 = Run.loadState(s"$outDir/model_r.bin").get
    assert(after1.iter == 1)

    // fresh query, fresh source, same state dir (its own checkpoint dir)
    val s2 = MemoryStream[String]
    val q2 = Run.trainingStream(Ingest.decodeEnvelope(s2.toDF()), Run.Sgd,
      outDir + "/2", tag = "r", stem = false, triggerMs = 50L)
    q2.stop() // only needed state-loading semantics, not another run
    // loadState keeps counters (the reference resets them on restart)
    val reloaded = Run.loadState(s"$outDir/model_r.bin").get
    assert(reloaded.iter == after1.iter && reloaded.bestF1 == after1.bestF1)
  }
}
