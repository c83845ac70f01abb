package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.Quality

/** In-flight pipeline observability via `Dataset.observe`: named
  * aggregates computed ON the streaming data as it flows (no second
  * pass, no extra shuffle — the accumulators ride the existing tasks)
  * and surfaced per-batch through `StreamingQueryProgress
  * .observedMetrics`. The production replacement for the reference's
  * console `df.show(5)` spot checks: a curation pipeline at 100 TB
  * audits row counts / quality drift from these metrics, not samples.
  */
object Observe {

  val MetricsName = "graft_curation_metrics"

  /** Attach curation metrics (row count, mean quality score, null-text
    * count) to a documents frame — streaming or batch. */
  def curationMetrics(docs: DataFrame): DataFrame = {
    val w = Quality.tokens(col("text"))
    docs.observe(MetricsName,
      count(lit(1)).as("n_rows"),
      avg(Quality.score(w)).as("mean_quality"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_texts"))
  }
}
