package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{HashingTF, StopWordsRemover, StringIndexer, Tokenizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.{Clean, Tokenize}

/** The reference's featurization chain (SURVEY §2.3–2.4) as one module:
  * null-drop (F1) → regex cleaning (P1–P6) → Tokenizer (T1) →
  * StopWordsRemover (T2) → optional Porter2 stem (T3) →
  * HashingTF(2500) (T4) → label index (T5).
  *
  * Uses the same MLlib classes the reference drove from Python
  * (`SGDC/sgdc.py:51-72`), so HashingTF bucketing is bit-identical
  * (murmur3, seed 42). The label map is FIXED (`"0"→0.0, "4"→1.0`)
  * instead of per-batch StringIndexer refit — the reference's refit can
  * flip the mapping between micro-batches when class frequencies flip
  * (SURVEY §2.11.2), which poisons incremental training; the dynamic
  * indexer is still available via [[dynamicLabelPipeline]].
  */
object Featurize {

  val NumFeatures = 2500

  /** F1 + P1–P6 on the raw (Label, Tweet) frame. */
  def cleaned(df: DataFrame): DataFrame =
    df.na.drop(Seq("Tweet")).withColumn("Tweet", Clean.clean(col("Tweet")))

  /** T1–T4 (+T3 if `stem`): adds `tf` (2500-dim SparseVector). */
  def features(df: DataFrame, stem: Boolean): DataFrame = {
    val tok = new Tokenizer().setInputCol("Tweet").setOutputCol("words_token")
    val stop = new StopWordsRemover().setInputCol("words_token").setOutputCol("filtered")
    val base = stop.transform(tok.transform(df))
    val withStem =
      if (stem) base.withColumn("stemmed", Tokenize.stemTokens(col("filtered")))
      else base
    val inCol = if (stem) "stemmed" else "filtered"
    new HashingTF().setNumFeatures(NumFeatures)
      .setInputCol(inCol).setOutputCol("tf")
      .transform(withStem)
  }

  /** T5 with the fixed label map (quirk fix, SURVEY §2.11.2). */
  def withTarget(df: DataFrame): DataFrame =
    df.withColumn("target",
      when(col("Label") === "4", 1.0).otherwise(0.0))

  /** Full chain: (Label, Tweet) → (…, tf, target). */
  def featurize(df: DataFrame, stem: Boolean = true): DataFrame =
    withTarget(features(cleaned(df), stem))

  /** The reference's exact 2-stage Pipeline (T6) with per-batch
    * StringIndexer refit — kept for API parity with
    * `Pipeline([hashtf, label_stringIdx])` (`SGDC/sgdc.py:68-72`).
    * `tokensCol` must name the column the upstream chain actually
    * produced ("stemmed" when stemming ran, else "filtered") so the
    * hash sees the reference's exact T6 input (`word_stemmed` in
    * `SGDC/sgdc.py:64`). */
  def dynamicLabelPipeline(tokensCol: String = "filtered"): Pipeline = {
    val tf = new HashingTF().setNumFeatures(NumFeatures)
      .setInputCol(tokensCol).setOutputCol("tf")
    val idx = new StringIndexer().setInputCol("Label").setOutputCol("target")
    new Pipeline().setStages(Array(tf, idx))
  }
}
