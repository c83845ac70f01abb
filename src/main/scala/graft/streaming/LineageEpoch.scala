package graft.streaming

import org.apache.spark.sql.SparkSession

/** CHECKPOINT-LINEAGE pin for scrub-gated log targets (r12 ADVICE): the
  * [[graft.sources.ScrubRegistry]] replay gate assumes one monotonic
  * batch-id lineage per log — `batchId <= upto` marks a batch as "the
  * scrub already covered this". A REDEPLOYED stream with a fresh
  * checkpoint restarts batch ids at 0; pointed at the same log target
  * its genuinely NEW content lands inside old erasure windows and gets
  * silently rewritten to tombstone form / dropped — prospective erasure
  * the design explicitly disclaims ("erasure is retroactive, never
  * prospective").
  *
  * The pin makes the single-lineage assumption ENFORCED instead of
  * documented ([[BucketMeta]]'s posture applied to checkpoints): at
  * stream start, a random lineage id is ensured INSIDE the checkpoint
  * directory (so it survives exactly as long as the batch-id sequence
  * it names) and validated against the target's recorded lineage.
  * Resuming the same checkpoint matches; a fresh checkpoint against a
  * used target fails LOUDLY at start — the operator either resumes the
  * original checkpoint, migrates to a fresh target, or consciously
  * wipes the old log (and with it the erasure windows that no longer
  * describe its contents).
  *
  * Legacy adoption: a target written before this pin existed has no
  * recorded lineage; the first pinned stream adopts it (publishes its
  * lineage). Files publish temp-then-rename; a torn file is never
  * authoritative (re-published on next ensure).
  */
private[graft] object LineageEpoch {

  private def targetPath(target: String) =
    new org.apache.hadoop.fs.Path(s"$target/_lineage")

  private def ckptPath(checkpoint: String) =
    new org.apache.hadoop.fs.Path(s"$checkpoint/_graft_lineage")

  private def readText(fs: org.apache.hadoop.fs.FileSystem,
                       p: org.apache.hadoop.fs.Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in).mkString.trim
                finally in.close()
      if (txt.isEmpty) None else Some(txt)
    }

  /** Temp-then-rename with a UUID tmp and a LOUD failure (r13 ADVICE,
    * low): a fixed tmp name under concurrent publishers, or an ignored
    * rename result on rename-no-overwrite semantics, could leave the
    * target unpinned with nothing thrown — the fresh-checkpoint
    * protection silently absent. The caller re-reads the published
    * file and treats its CONTENT as authoritative (a lost race is a
    * concurrent first-touch whose id wins). */
  private def publish(fs: org.apache.hadoop.fs.FileSystem,
                      p: org.apache.hadoop.fs.Path, id: String): Unit = {
    fs.mkdirs(p.getParent)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      s".${p.getName}.tmp-${java.util.UUID.randomUUID.toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(id.getBytes("UTF-8")) finally out.close()
    graft.sources.AtomicFiles.publishOrThrow(fs, tmp, p, recursiveTmp = false)
  }

  /** The checkpoint's lineage id, minted on first touch. */
  private def lineageOf(s: SparkSession, checkpoint: String): String = {
    val p = ckptPath(checkpoint)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    readText(fs, p).getOrElse {
      val id = java.util.UUID.randomUUID.toString
      publish(fs, p, id)
      // a concurrent first-touch may have won the rename race: the
      // FILE's content is authoritative, not our candidate id
      readText(fs, p).getOrElse(id)
    }
  }

  /** Validate-or-adopt at stream start: the checkpoint's lineage must
    * equal the target's recorded one (absent/torn → adopt). */
  def ensure(s: SparkSession, target: String, checkpoint: String): Unit = {
    val id = lineageOf(s, checkpoint)
    val p = targetPath(target)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    readText(fs, p) match {
      case Some(stored) if stored != id =>
        throw new IllegalStateException(
          s"log target $target belongs to checkpoint lineage $stored, but " +
            s"this stream's checkpoint ($checkpoint) is lineage $id — a " +
            "fresh checkpoint restarts batch ids at 0, and this target's " +
            "registered erasure windows would silently rewrite its new " +
            "batches (ScrubRegistry gates on batch id). Resume the " +
            "original checkpoint, or point the redeploy at a fresh target.")
      case Some(_) => ()
      case None =>
        publish(fs, p, id)
        // adopt must be CONFIRMED (r13 ADVICE, low): a concurrent
        // adopter may have won the publish race, and the recorded file
        // is authoritative — if its lineage is not ours, this stream
        // must fail exactly as the Some(stored != id) case does,
        // instead of running unpinned against someone else's target.
        val recorded = readText(fs, p)
        if (!recorded.contains(id))
          throw new IllegalStateException(
            s"log target $target lineage adoption lost a race: recorded " +
              s"${recorded.getOrElse("<none>")}, this stream's checkpoint " +
              s"($checkpoint) is lineage $id — another checkpoint adopted " +
              "the target first; point this redeploy at a fresh target.")
    }
  }
}
