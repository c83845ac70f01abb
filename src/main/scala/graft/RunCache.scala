package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once materialization of a derived frame shared by several
  * queries in one run (r6 verdict item 4): the near-dup edge list is
  * consumed by five graph queries (q73/q112/q125/q126/q128), and
  * rebuilding it from the raw corpus per query means five full corpus
  * passes where a production pipeline pays ONE — at 100 TB that is the
  * difference between a graph-analytics suite and five dedup jobs.
  *
  * First caller per (key) builds the frame and writes it to parquet
  * under a run-scoped temp directory; every caller (including the
  * first) gets a DataFrame READING that parquet — so downstream plans
  * are lineage-truncated at a real file source with column pruning and
  * pushdown, not a localCheckpoint pinned in executor memory. On a
  * cluster the same idiom targets a checkpoint/run directory on the
  * shared FS; the run-dir lifetime (deleted with the JVM) is what makes
  * blind reuse safe — the cache can never serve stale edges across
  * corpus versions because a new run is a new JVM.
  *
  * `computeIfAbsent` makes the build exactly-once under concurrent
  * callers (Gate's measure-then-branch discipline applied to a write:
  * the guarded side runs once, everyone else takes the cheap branch).
  */
object RunCache {
  private val built = new ConcurrentHashMap[String, String]()

  def parquetOnce(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val path = built.computeIfAbsent(key, _ => {
      val dir = java.nio.file.Files.createTempDirectory("graft_runcache")
      dir.toFile.deleteOnExit()
      val out = s"$dir/data"
      build.write.mode("overwrite").parquet(out)
      out
    })
    s.read.parquet(path)
  }
}
