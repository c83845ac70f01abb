package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.Quality

/** Streaming quality gate for corpus curation (ROADMAP item 8): score
  * each in-flight document with the SAME column expressions as batch q34
  * and keep only those above the threshold.
  *
  * Stateless — pure per-row codegen'd expressions, no shuffle, no state
  * store — so it composes with any downstream streaming operator
  * (dedup, windowed aggregation) and scales with partition count alone.
  */
object StreamQuality {

  /** Append quality columns to a (streaming or batch) frame with a
    * `text` column. */
  def scored(docs: DataFrame): DataFrame = {
    val w = Quality.tokens(col("text"))
    docs.withColumn("quality_score", Quality.score(w))
      .withColumn("n_tokens", Quality.nTokens(w))
  }

  /** Keep documents scoring at or above `minScore`. */
  def filtered(docs: DataFrame, minScore: Double): DataFrame =
    scored(docs).where(col("quality_score") >= minScore)
}
