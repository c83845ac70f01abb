package graft.queries

import graft.multimodal.Media
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multimodal plumbing exercised end-to-end: the document-derived fake
  * media table runs through the REAL `Dataset.mapPartitions` feature
  * pass (graft.multimodal.Media), and because the stub decoder is an
  * md5 keystream the result still has an exact DuckDB oracle.
  */
object MediaQueries {

  /** q43 — batched fingerprint extraction over binary payloads. */
  def mediaFingerprints(s: SparkSession, dir: String): DataFrame =
    Media.fingerprints(Media.fromDocuments(s, dir))
      .select(col("mediaId").as("media_id"), col("kind"),
        col("j").cast(LongType).as("j"), col("feat"))
      .orderBy(col("media_id"), col("j"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_media_fingerprints" -> mediaFingerprints
  )

  val oracles: Map[String, String] = Map(
    "q43_media_fingerprints" ->
      s"""SELECT doc_id AS media_id,
         |       CASE WHEN doc_id % 3 = 0 THEN 'image'
         |            WHEN doc_id % 3 = 1 THEN 'audio'
         |            ELSE 'video' END AS kind,
         |       j, substr(md5(text || '|' || j), 1, 12) AS feat
         |FROM documents, unnest(range(0, ${Media.FeatDim})) AS u(j)
         |ORDER BY media_id, j""".stripMargin
  )
}
