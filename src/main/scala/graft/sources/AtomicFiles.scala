package graft.sources

/** The temp-then-rename publish contract, once (six hand-rolled copies
  * before the r12 review): rename `tmp` to `p`; on failure, swallow
  * ONLY a lost race (the winner's file exists — delete ours), else
  * fail loud. A silent failure here degrades permanently (a missing
  * sidecar disables a delta path forever; a missing bloom forces
  * full-log discovery), so losing loudly beats losing quietly. */
private[graft] object AtomicFiles {

  def publishOrThrow(fs: org.apache.hadoop.fs.FileSystem,
                     tmp: org.apache.hadoop.fs.Path,
                     p: org.apache.hadoop.fs.Path,
                     recursiveTmp: Boolean): Unit =
    if (!fs.rename(tmp, p)) {
      if (fs.exists(p)) fs.delete(tmp, recursiveTmp) // lost a race: theirs won
      else throw new IllegalStateException(s"publish failed: $tmp -> $p")
    }
}
