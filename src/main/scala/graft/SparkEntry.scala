package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates per-module registries; every entry that is
  * SQL-expressible has a matching DuckDB oracle in `oracleSql` (same column
  * names, total ORDER BY, float-stable aggregation — SURVEY §5.1).
  */
object SparkEntry {
  private def registries = Seq(
    (graft.queries.TextQueries.queries, graft.queries.TextQueries.oracles),
    (graft.queries.RelationalQueries.queries, graft.queries.RelationalQueries.oracles),
    (graft.queries.DedupQueries.queries, graft.queries.DedupQueries.oracles),
    (graft.queries.SimilarityQueries.queries, graft.queries.SimilarityQueries.oracles),
    (graft.queries.TextStatsQueries.queries, graft.queries.TextStatsQueries.oracles),
    (graft.queries.WindowQueries.queries, graft.queries.WindowQueries.oracles),
    (graft.queries.MediaQueries.queries, graft.queries.MediaQueries.oracles),
    (graft.queries.CurationQueries.queries, graft.queries.CurationQueries.oracles),
    (graft.queries.AnalyticsQueries.queries, graft.queries.AnalyticsQueries.oracles),
    (graft.queries.OpsQueries.queries, graft.queries.OpsQueries.oracles)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.TextQueries.cleanTokens(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.map(_._2).reduce(_ ++ _)
}
