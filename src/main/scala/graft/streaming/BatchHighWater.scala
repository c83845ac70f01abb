package graft.streaming

import org.apache.spark.sql.SparkSession

/** The highest batch id that may have touched a stream-maintained
  * store — the `upto` its takedown scrub records in the
  * [[graft.sources.ScrubRegistry]] (r13 self-review finding 4): the
  * merge/index LOGS derive that bound from their batch_id partitions,
  * but the bucket-merged stores (dup-edges, verdict flags, the ANN
  * code index) keep no per-batch state, so without this note a scrub
  * cannot bound its erasure window and a checkpoint REPLAY of a
  * pre-scrub batch re-derives the victims' rows into the distinct/max
  * merge with nothing left to re-scrub them.
  *
  * Recorded FIRST in every batch, before any data write: a crash
  * after the note but before the data means the note over-counts by
  * one — and gating that batch's replay is retroactively CORRECT (its
  * content predates the scrub decision) — while note-last would
  * under-count and let an in-flight batch's replay resurrect erased
  * content. Temp-then-rename; a torn note reads as -1 (no batches),
  * which a scrub treats as "nothing replayable to gate" only on a
  * store that genuinely has no data yet.
  */
private[graft] object BatchHighWater {

  private def notePath(target: String) =
    new org.apache.hadoop.fs.Path(s"$target/_maxbatch")

  def read(s: SparkSession, target: String): Long = {
    val p = notePath(target)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return -1L
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in).mkString.trim
              finally in.close()
    txt.toLongOption.getOrElse(-1L)
  }

  /** Raise the note to `batchId` (monotone; replays never lower it). */
  def record(s: SparkSession, target: String, batchId: Long): Unit = {
    if (batchId <= read(s, target)) return
    val p = notePath(target)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      s".${p.getName}.tmp-${java.util.UUID.randomUUID.toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(s"$batchId\n".getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    graft.sources.AtomicFiles.publishOrThrow(fs, tmp, p, recursiveTmp = false)
  }
}
