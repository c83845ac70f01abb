package graft.streaming

import java.io.{File, FileOutputStream, ObjectInputStream, ObjectOutputStream, FileInputStream}
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ml.{Featurize, Incremental, Metrics}

/** The reference's training pipelines (EP1, SURVEY §3) on Structured
  * Streaming: 5 s micro-batches → featurize → incremental update →
  * holdout metrics → CSV/TXT/model sinks (K1–K4).
  *
  * Differences from the reference, by design (SURVEY §2.11):
  *   - fixed label map instead of per-batch StringIndexer refit;
  *   - the metric is named `mse`, not `rmse`;
  *   - model weights AND counters checkpoint to disk each batch, so a
  *     restart resumes both (the reference reloads the pickle but resets
  *     its in-memory counters);
  *   - state crossing executor→driver is weight-sized, never the batch.
  */
object Run {

  /** One of the four incremental models behind a common train/score
    * face, so the stream loop and checkpoints are model-agnostic. */
  sealed trait ModelState extends Serializable {
    def partialFit(train: DataFrame): Unit
    /** Adds a `prediction` column (class id / cluster id). */
    def predict(df: DataFrame): DataFrame
  }
  final class LinearState(val m: Incremental.LinearModel,
                          update: (Incremental.LinearModel, DataFrame) => Unit)
    extends ModelState {
    def partialFit(train: DataFrame): Unit = update(m, train)
    def predict(df: DataFrame): DataFrame = m.predictCol(df)
  }
  final class NbState(val nb: Incremental.BernoulliNB) extends ModelState {
    def partialFit(train: DataFrame): Unit = nb.partialFit(train)
    def predict(df: DataFrame): DataFrame = nb.toLinear.predictCol(df)
  }
  final class KmState(val km: Incremental.MiniBatchKMeans) extends ModelState {
    def partialFit(train: DataFrame): Unit = km.partialFit(train)
    def predict(df: DataFrame): DataFrame = km.predictCol(df)
  }

  /** Serializable snapshot persisted per batch (mirrors the reference's
    * per-batch `joblib.dump`, `SGDC/sgdc.py:90`). `lastBatch` records the
    * last applied streaming batchId so a crash-restart replay of an
    * already-trained batch is skipped instead of double-applying its
    * gradient and duplicating its CSV row (exactly-once effect on top of
    * foreachBatch's at-least-once delivery). */
  case class TrainState(model: ModelState,
                        var iter: Long, var bestF1: Double,
                        var lastBatch: Long = -1L)
    extends Serializable

  def saveState(s: TrainState, path: String): Unit = {
    val out = new ObjectOutputStream(new FileOutputStream(path))
    try out.writeObject(s) finally out.close()
  }

  def loadState(path: String): Option[TrainState] =
    if (!new File(path).exists()) None
    else {
      val in = new ObjectInputStream(new FileInputStream(path))
      try Some(in.readObject().asInstanceOf[TrainState]) finally in.close()
    }

  sealed trait Algo
  case object Sgd extends Algo
  case object Pa extends Algo
  case object Bnb extends Algo
  case object Kmeans extends Algo

  private def freshState(algo: Algo): ModelState = algo match {
    case Sgd => new LinearState(new Incremental.LinearModel(Featurize.NumFeatures),
      Incremental.SgdHinge.partialFit)
    case Pa => new LinearState(new Incremental.LinearModel(Featurize.NumFeatures),
      Incremental.PassiveAggressive.partialFit)
    case Bnb => new NbState(new Incremental.BernoulliNB(Featurize.NumFeatures))
    case Kmeans => new KmState(
      new Incremental.MiniBatchKMeans(k = 2, dim = Featurize.NumFeatures))
  }

  /** EP2 — the reference's inference-only pipeline (`TESTING .py`):
    * featurize each micro-batch (no stemming, matching its quirk of
    * scoring with train-time-stemmed weights on unstemmed features —
    * here controlled by `stem`), score the WHOLE batch with a frozen
    * model, append metrics. No split, no training, no model writes.
    */
  def inferenceStream(records: DataFrame, statePath: String, outDir: String,
                      tag: String = "infer", stem: Boolean = false,
                      triggerMs: Long = 5000L): StreamingQuery = {
    new File(outDir).mkdirs()
    val model: ModelState = loadState(statePath)
      .getOrElse(throw new IllegalArgumentException(s"no model at $statePath"))
      .model
    val csvPath = Paths.get(s"$outDir/infer_$tag.csv")
    if (!Files.exists(csvPath))
      Files.writeString(csvPath, "batch,f1,acc,precision,recall,n,mse\n")
    // Replay guard: foreachBatch is at-least-once, so persist the last
    // appended batchId in a sidecar and skip batches at or below it —
    // a restart never duplicates a CSV row.
    val lastPath = Paths.get(s"$outDir/infer_$tag.last")
    var lastBatch =
      if (Files.exists(lastPath)) Files.readString(lastPath).trim.toLong else -1L
    var batchNo = 0L
    records.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", s"$outDir/_checkpoint_infer_$tag")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > lastBatch && !batch.isEmpty) {
          val scored = model.predict(Featurize.featurize(batch, stem))
          val m = Metrics.binaryCollect(scored)
          batchNo += 1
          Files.writeString(csvPath,
            f"$batchNo,${m.f1}%.6f,${m.accuracy}%.6f,${m.precision}%.6f," +
              f"${m.recall}%.6f,${batch.count()},${m.mse}%.6f\n",
            StandardOpenOption.APPEND)
          lastBatch = batchId
          Files.writeString(lastPath, s"$batchId\n")
        }
        ()
      }
      .start()
  }

  /** Start the incremental-training stream over a (Label, Tweet) stream
    * frame (already envelope-decoded — compose with Ingest.socketLines +
    * Ingest.decodeEnvelope for the reference's exact source).
    *
    * Per batch (cf. `SGDC/sgdc.py:31-126`): featurize → 80:20 split
    * (seed 42, M5) → partial_fit on the train split → score holdout →
    * metrics CSV append + stats TXT overwrite + state checkpoint, with a
    * best-F1 model copy on improvement (K2–K4).
    */
  /** `dynamicLabel = true` reproduces the reference's per-batch
    * StringIndexer refit (T5, `SGDC/sgdc.py:65,71`) instead of the fixed
    * 0/4 map: the label→index mapping is re-derived from batch
    * frequencies every trigger, so it can flip between micro-batches —
    * kept for behavioral parity, off by default (SURVEY §2.11.2). */
  def trainingStream(records: DataFrame, algo: Algo, outDir: String,
                     tag: String = "3000", stem: Boolean = true,
                     triggerMs: Long = 5000L,
                     consoleSample: Boolean = false,
                     dynamicLabel: Boolean = false): StreamingQuery = {
    new File(outDir).mkdirs()
    val statePath = s"$outDir/model_$tag.bin"
    val bestPath = s"$outDir/model_bestfsc_$tag.bin"
    val csvPath = Paths.get(s"$outDir/stats_$tag.csv")
    if (!Files.exists(csvPath))
      Files.writeString(csvPath, "iter,f1,maxf1,acc,precision,recall,batchsize,mse\n")

    val state = loadState(statePath).getOrElse(
      TrainState(freshState(algo), 0L, 0.0))

    records.writeStream
      .trigger(Trigger.ProcessingTime(triggerMs))
      .option("checkpointLocation", s"$outDir/_checkpoint_$tag")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Replay guard: a crash between the model checkpoint and the
        // streaming commit replays the batch; training it again would
        // double-apply the gradient. State carries the last applied id.
        if (batchId > state.lastBatch && !batch.isEmpty) {
          // K1 — per-batch console sample (the reference's df.show(5),
          // `TESTING .py:67`), off by default.
          if (consoleSample) batch.show(5)
          val featurized =
            if (dynamicLabel) {
              // the reference's exact T6 pipeline: HashingTF + per-batch
              // StringIndexer refit, hashing the same column the chain
              // produced (stemmed when stem=true, matching sgdc.py:64)
              val toks = Featurize.features(Featurize.cleaned(batch), stem).drop("tf")
              val tokensCol = if (stem) "stemmed" else "filtered"
              Featurize.dynamicLabelPipeline(tokensCol).fit(toks).transform(toks)
            } else Featurize.featurize(batch, stem)
          val Array(train, test) = featurized.randomSplit(Array(0.8, 0.2), seed = 42)
          state.model.partialFit(train)
          val scored = state.model.predict(test)
          // K-means emits arbitrary cluster ids; scoring them directly as
          // class labels is the reference's quirk (SURVEY §2.11.3) — here
          // metrics use the id↔label alignment with the higher accuracy.
          val m = algo match {
            case Kmeans =>
              import org.apache.spark.sql.functions.{col, lit}
              val flipped = scored.withColumn("prediction",
                lit(1.0) - col("prediction"))
              val (asIs, flip) =
                (Metrics.binaryCollect(scored), Metrics.binaryCollect(flipped))
              if (flip.accuracy > asIs.accuracy) flip else asIs
            case _ => Metrics.binaryCollect(scored)
          }
          state.iter += 1
          val batchSize = batch.count()
          Files.writeString(csvPath,
            f"${state.iter},${m.f1}%.6f,${math.max(state.bestF1, m.f1)}%.6f," +
              f"${m.accuracy}%.6f,${m.precision}%.6f,${m.recall}%.6f," +
              f"$batchSize,${m.mse}%.6f\n",
            StandardOpenOption.APPEND)
          Files.writeString(Paths.get(s"$outDir/stats_$tag.txt"),
            s"iter=${state.iter}\nf1=${m.f1}\nbest_f1=${math.max(state.bestF1, m.f1)}\n" +
              s"batch_size=$batchSize\n")
          state.lastBatch = batchId
          if (m.f1 > state.bestF1) {
            state.bestF1 = m.f1
            saveState(state, bestPath)
          }
          saveState(state, statePath)
        }
        ()
      }
      .start()
  }
}
