package graft.sources

import org.apache.spark.sql.SparkSession

/** The REPLAY GATE for retroactive log/index erasure (found by the
  * r12 adversarial review): a takedown scrub rewrites on-disk
  * partitions, but a checkpoint replay of an in-flight batch — or
  * source redelivery of a pre-scrub batch — rewrites its batch_id
  * partition with the ORIGINAL pre-scrub rows, resurrecting erased
  * content with nothing left to re-scrub (the scrub ran at flag time;
  * the same hole [[graft.streaming.StreamAnnCells]] closes with its
  * tombstone anti-join). The registry makes the scrub durable against
  * replay: each scrub appends `(docId, upto)` entries under
  * `<target>/_scrubbed/`, where `upto` is the highest batch id that
  * existed at scrub time — every batch the scrub could have touched.
  * Writers gate ONLY batches with `batchId <= upto` (the replayable
  * window): a replayed pre-scrub batch re-applies the erasure form; a
  * GENUINELY NEW batch (higher id) passes through untouched, so a
  * post-takedown re-add of the same doc id keeps its history —
  * erasure is retroactive, never prospective.
  *
  * Cost: one small file per scrub (temp-then-rename, torn files
  * skipped), one metadata listing + tiny reads per batch write —
  * bounded by takedown count, the cascade's standard posture.
  * Idempotent: re-running a scrub appends an equivalent entry; the
  * read merges by max(upto). */
object ScrubRegistry {

  private def dir(target: String) =
    new org.apache.hadoop.fs.Path(s"$target/_scrubbed")

  /** Record that `flagged` were erased from every batch ≤ `upto`. */
  def append(s: SparkSession, target: String, flagged: Seq[Long],
             upto: Long): Unit = {
    if (flagged.isEmpty) return
    val d = dir(target)
    val fs = d.getFileSystem(s.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(d,
      java.util.UUID.randomUUID.toString.take(12))
    val tmp = new org.apache.hadoop.fs.Path(d, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(flagged.distinct.sorted
      .map(id => s"$id $upto").mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    AtomicFiles.publishOrThrow(fs, tmp, p, recursiveTmp = false)
  }

  /** Every registered erasure for `target`: docId → max upto. */
  def read(s: SparkSession, target: String): Map[Long, Long] = {
    val d = dir(target)
    val fs = d.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) return Map.empty
    fs.listStatus(d).toSeq
      .filterNot(_.getPath.getName.startsWith("."))
      .flatMap { st =>
        // FAIL CLOSED: registry files are rename-published (never
        // torn), so a read error here is a real filesystem fault — and
        // this is a LEGAL-ERASURE gate: failing open would let a
        // replayed pre-scrub batch resurrect erased content. Propagate
        // and fail the batch loudly instead (r12 review finding).
        val in = fs.open(st.getPath)
        val txt = try scala.io.Source.fromInputStream(in).mkString
                  finally in.close()
        txt.linesIterator.filter(_.nonEmpty).map { line =>
          val Array(id, upto) = line.trim.split(" ")
          (id.toLong, upto.toLong)
        }.toSeq
      }
      .groupMapReduce(_._1)(_._2)(math.max)
  }

  /** The doc ids whose erasure window covers `batchId` — the set a
    * writer must gate this batch against (empty for new batches). */
  def gatedIds(s: SparkSession, target: String, batchId: Long): Seq[Long] =
    read(s, target).collect { case (id, upto) if batchId <= upto => id }.toSeq

  /** The highest batch id currently present under a batch_id-
    * partitioned log — the `upto` a scrub records. */
  def maxBatchId(s: SparkSession, log: String): Long = {
    val root = new org.apache.hadoop.fs.Path(log)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return -1L
    fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong)
      .foldLeft(-1L)(math.max)
  }
}
