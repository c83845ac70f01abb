package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** CROSS-PROCESS single-writer enforcement for storage-target mutation
  * (r12 verdict item 2): the read-modify-write mutators of a shared
  * target — a streaming compaction merging buckets, a takedown scrub
  * rewriting the same partitions — were serialized in-JVM by per-path
  * monitors (ServeBooks.withCellsLock, ArtifactStore.buildLocks), with
  * the cross-process case a DOCUMENTED invariant. A real cluster runs
  * the compaction job and the scrub job in different JVMs, where an
  * interleaved read-modify-write loses one side's rows silently (a
  * scrub's victims resurrected by a merge that read pre-scrub files, or
  * a merge's fresh rows dropped by a scrub that read pre-merge files).
  * This is the MECHANISM: an in-JVM monitor (fast path, reentrant by
  * hold-count) plus an on-disk LEASE FILE claimed with an atomic
  * create-no-overwrite — the ArtifactStore staging-dir pattern applied
  * to mutation instead of publication.
  *
  * Lease protocol:
  *  - claim `<target>/_mutate.lease` with `fs.create(overwrite=false)`
  *    — atomic on HDFS and POSIX-backed stores (documented assumption;
  *    object stores without atomic create need an external lock
  *    service, the standard caveat);
  *  - a held lease fails the caller LOUDLY with the holder's identity —
  *    never block-and-wait (the holder may be a long compaction; the
  *    caller decides whether to retry, exactly like a lost ArtifactStore
  *    publish race is decided by the caller's semantics);
  *  - a lease older than `staleMs` is presumed crashed and BROKEN
  *    (deleted, claim retried once): leases are not heartbeat-renewed,
  *    so staleness is the only liveness signal. The default (15 min)
  *    bounds how long a crashed holder wedges the target; a mutation
  *    legitimately longer than the window must pass its own `staleMs`
  *    or it can be stolen from — the documented trade.
  *
  * The underscore-prefixed name keeps the lease invisible to parquet
  * readers of the same directory (Spark/DuckDB skip `_`/`.` files).
  */
private[graft] object MutationLease {

  val DefaultStaleMs: Long = 15L * 60 * 1000

  private case class Hold(monitor: Object) { var count: Int = 0 }
  private val holds = new ConcurrentHashMap[String, Hold]()

  private def leasePath(target: String) =
    new org.apache.hadoop.fs.Path(target, "_mutate.lease")

  /** Run `body` holding the target's mutation lease: in-JVM threads
    * serialize on the monitor (reentrant — a scrub nested inside a
    * merge re-enters its own hold), and the on-disk lease excludes
    * other processes for the duration. Throws [[IllegalStateException]]
    * when another process holds a fresh lease. */
  def withLease[T](s: SparkSession, target: String,
                   staleMs: Long = DefaultStaleMs)(body: => T): T = {
    val hold = holds.computeIfAbsent(target, _ => Hold(new Object))
    hold.monitor.synchronized {
      val first = hold.count == 0
      if (first) acquire(s, target, staleMs)
      hold.count += 1
      try body
      finally {
        hold.count -= 1
        if (first) release(s, target)
      }
    }
  }

  private def acquire(s: SparkSession, target: String, staleMs: Long): Unit = {
    val p = leasePath(target)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    def claim(): Boolean =
      try {
        val out = fs.create(p, false) // atomic create-no-overwrite
        try out.write(
          s"${java.lang.ProcessHandle.current.pid}@${
            java.net.InetAddress.getLocalHost.getHostName} ${
            java.util.UUID.randomUUID}".getBytes("UTF-8"))
        finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException if fs.exists(p) => false
      }
    if (!claim()) {
      val st = try Some(fs.getFileStatus(p)) catch {
        case _: java.io.FileNotFoundException => None // released between
      }
      val stale = st.forall(
        System.currentTimeMillis() - _.getModificationTime > staleMs)
      if (stale) {
        // presumed-crashed holder: break the lease, retry ONCE — a
        // second failure means live contention, which must stay loud
        st.foreach(x => fs.delete(x.getPath, false))
        if (!claim())
          throw new IllegalStateException(
            s"mutation lease contended after breaking a stale lease: $p")
      } else {
        val holder = {
          val in = fs.open(p)
          try scala.io.Source.fromInputStream(in).mkString.trim
          catch { case _: Throwable => "<unreadable>" }
          finally in.close()
        }
        throw new IllegalStateException(
          s"target is being mutated by another process (lease $p held by " +
            s"$holder, age ${st.map(x => System.currentTimeMillis() -
              x.getModificationTime).getOrElse(-1L)} ms); " +
            "retry after it completes, or delete the lease if the holder " +
            "is known dead")
      }
    }
  }

  private def release(s: SparkSession, target: String): Unit = {
    val p = leasePath(target)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
  }
}
