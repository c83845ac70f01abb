package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: the shuffle-free path for repeated
  * fact-to-fact joins (ROADMAP item 4, VERDICT r1 item 9).
  *
  * A sort-merge join between two tables bucketed AND sorted on the join
  * key with the same bucket count reads each bucket pair directly — no
  * Exchange on either side. At 100 TB this converts every downstream
  * lineitem⋈orders from a full 2-sided shuffle into a partition-local
  * merge, amortizing ONE bucketed write across every later join, which
  * is exactly how a warehouse lays out its largest fact tables.
  *
  * (Broadcast stays the right tool for DIMENSION joins — bucketing is for
  * the fact-fact case where neither side fits in memory.)
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted parquet table at `path`.
    * `repartition` on the key first so each bucket is a single sorted
    * file — fewer files and a cheaper downstream merge. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.repartition(buckets, df(key))
      .write.format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two pre-bucketed tables on their bucket key. With matching
    * bucket counts the planner emits a shuffle-free sort-merge join —
    * asserted by BucketedJoinSpec (no ShuffleExchange in the plan). */
  def coLocatedJoin(s: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String): DataFrame = {
    val l = s.table(left)
    val r = s.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
