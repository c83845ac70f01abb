package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Document quality heuristics (length / stop-word / type-token ratios)
  * as pure codegen'd column expressions — shared verbatim by the batch
  * q34 oracle query and the streaming quality gate
  * (graft.streaming.StreamQuality), so a document scores identically
  * whether curated in batch or in flight.
  */
object Quality {

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def nTokens(w: Column): Column = size(w).cast(LongType)

  /** Type-token ratio: distinct / total. */
  def uniqRatio(w: Column): Column =
    size(array_distinct(w)).cast(DoubleType) / size(w)

  /** Stop-word fraction of all tokens. */
  def stopRatio(w: Column): Column = {
    val stopArr = array(Tokenize.stopWords.map(lit): _*)
    size(filter(w, t => array_contains(stopArr, t))).cast(DoubleType) / size(w)
  }

  def meanTokenLen(w: Column): Column =
    aggregate(w, lit(0L), (acc, t) => acc + length(t)).cast(DoubleType) / size(w)

  /** Bounded composite: rewards vocabulary diversity, penalizes
    * stop-word soup, saturates the length reward at 100 tokens. */
  def score(w: Column): Column =
    lit(0.3) * uniqRatio(w) + lit(0.3) * (lit(1.0) - stopRatio(w)) +
      lit(0.4) * least(lit(1.0), size(w).cast(DoubleType) / lit(100.0))
}
