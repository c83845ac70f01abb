package graft.streaming

import graft.llm.{ServeBooks, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.LongType

/** The ANN serve loop LIVE: query vectors arrive on a stream and each
  * micro-batch is answered with q55's exact IVF pipeline — row-local
  * probe-list expressions over the in-engine-trained ServeBooks
  * codebook, a candidate join against the pre-assigned corpus cells,
  * exact-cosine rank, top-K out. The batch index and the live server
  * are the SAME code path (the probe/rank tail runs inside
  * foreachBatch), so StreamAnnServeSpec can assert the streamed
  * answers equal batch q55 row-for-row — the production property that
  * an online ANN service returns what the offline evaluation measured.
  *
  * Scale posture: the corpus side is assigned ONCE at server start
  * (row-local argmin, no shuffle) and persisted; each micro-batch then
  * costs Σ_cell |batch queries probing cell|·|cell| — the q55 join
  * bound — plus a per-query top-K window over candidate rows only.
  * The 20 KiB codebook rides the closure; queries never see the corpus
  * outside their probed cells.
  */
object StreamAnnServe {

  val K = 5
  val Probes = 8

  /** Answer one micro-batch of (query_id, qv DOUBLE[]) against the
    * prepared corpus cells — q55's tail, verbatim. */
  def answerBatch(cells: DataFrame, book: Array[Array[Double]])
                 (batch: DataFrame): DataFrame = {
    val probes = batch
      .select(col("query_id"), col("qv"),
        sqrt(VectorOps.dot(col("qv"), col("qv"))).as("qnrm"),
        explode(ServeBooks.probeCells(book, Probes, col("qv"))).as("probe"))
    val cos = VectorOps.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(cells,
        col("probe") === col("cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rn", row_number().over(wRank).cast(LongType))
      .where(col("rn") <= K)
  }

  /** The corpus side, prepared once at server start: every vector with
    * its norm and assigned cell (row-local), persisted so micro-batches
    * pay the candidate join only. */
  def prepareCells(s: SparkSession, dir: String): DataFrame = {
    val book = ServeBooks.coarse(s, dir)
    graft.Tables.embeddings(s, dir)
      .select(col("vec_id"), VectorOps.toDoubleArr(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
      .withColumn("cell", ServeBooks.cell(book, col("v")))
      .persist()
  }

  /** queries(query_id, qv array<double>) stream → answers appended as
    * parquet under `out` (query_id, neighbor_id, cos, rn).
    *
    * The tombstone set is re-read EVERY micro-batch (r9 verdict
    * item 4): the batch serve queries anti-join `vec_tombstones_v1` at
    * plan time, and a long-lived serve stream that froze the set at
    * start would keep answering from pre-takedown vectors — the
    * compliance hole the batch side closed in r9. The per-batch read
    * is the bounded-by-deletion-volume artifact (broadcast side);
    * [[graft.sources.VecTakedown.flag]] republishes it at the same
    * path, so the next batch's read picks the flags up without a
    * stream restart. The BOOKS stay frozen at stream start by design —
    * exclusion is the compliance property; geometry refresh happens at
    * the next index rebuild. */
  def start(queries: DataFrame, dir: String, out: String,
            checkpoint: String): StreamingQuery = {
    val s = queries.sparkSession
    val cells = prepareCells(s, dir)
    val book = ServeBooks.coarse(s, dir)
    queries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val served = cells.join(
            broadcast(graft.sources.VecTakedown.tombstones(s, dir)),
            Seq("vec_id"), "left_anti")
          answerBatch(served, book)(batch.localCheckpoint())
            .write.mode("append").parquet(out)
        }
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
