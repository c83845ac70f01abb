package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication: emit each document the FIRST time its
  * content digest appears in the stream, drop every later occurrence —
  * the streaming face of batch dedup q24.
  *
  * State is one boolean per distinct digest, partitioned by digest hash
  * across executors (`flatMapGroupsWithState`), so memory scales with
  * |distinct corpus| / cluster, not with stream length; at 100 TB the
  * digest state would additionally carry a TTL/timeout policy
  * (`GroupStateTimeout`) or be swapped for `dropDuplicatesWithinWatermark`
  * when boundedness matters more than exactness.
  */
object StreamDedup {

  case class Doc(docId: Long, text: String)
  case class Deduped(docId: Long, digest: String)

  /** First-seen filter on a streaming Dataset of documents. */
  def firstSeen(docs: DataFrame): Dataset[Deduped] = {
    import docs.sparkSession.implicits._
    docs.select(col("docId"), md5(col("text")).as("digest"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (digest: String, rows: Iterator[(Long, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // deterministic winner within a batch: smallest docId
            Iterator.single(Deduped(rows.map(_._1).min, digest))
          }
      }
  }
}
