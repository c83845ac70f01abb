package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** FILE-LEVEL corpus identity (r12 verdict item 1's enabling layer):
  * a 100 TB corpus changes by FILES — an append lands new parquet
  * part-files, a re-crawl replaces some — so corpus-scale work that
  * only needs to know WHAT CHANGED must be priced by the changed
  * files, not by a full re-scan. This helper gives the two primitives:
  *
  *  - [[list]]: the corpus table's data files as (path, size, mtime)
  *    triples — the identity a file keeps exactly as long as its bytes
  *    do (the git-index discipline; size+mtime is the standard
  *    modification proxy, documented assumption: a writer that
  *    back-dates mtime while changing bytes defeats it, which no
  *    parquet writer does);
  *  - [[srcCol]]: the normalized source-file column for a scan, so
  *    per-row facts (digests) can be grouped back to the file that
  *    holds them and carried file-by-file.
  *
  * Fingerprints compose over files because the per-row digests SUM
  * (ArtifactStore's commutative checksum): fp = (Σ_file Σ_rows h) mod
  * M = (Σ_file (file sum mod M)) mod M — so an unchanged file's
  * contribution is reusable verbatim and only changed files are
  * re-read ([[graft.ArtifactStore]]'s fp cache and the delta
  * generations' carry certificates both build on this).
  */
private[graft] object CorpusFiles {

  /** Scheme-stripped path of `input_file_name()` — matches the
    * URI-path form [[list]] returns, across `file:///x`, `file:/x`,
    * and `scheme://authority/x` spellings. */
  def srcCol: Column =
    regexp_replace(
      regexp_replace(input_file_name(),
        lit("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*"), lit("")),
      lit("^file:"), lit(""))

  /** Data files of `<dir>/<table>.parquet` (a single file or a
    * directory of part-files), as (uri-path, size, mtime) sorted by
    * path. Hidden/underscore entries (_SUCCESS, .crc) are skipped. */
  def list(s: SparkSession, dir: String,
           table: String): Seq[(String, Long, Long)] = {
    val root = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Seq[(String, Long, Long)] = {
      val st = fs.getFileStatus(p)
      if (st.isFile) Seq((p.toUri.getPath, st.getLen, st.getModificationTime))
      else fs.listStatus(p).toSeq
        .filterNot { c =>
          val n = c.getPath.getName
          n.startsWith("_") || n.startsWith(".")
        }
        .flatMap(c => walk(c.getPath))
    }
    walk(root).sortBy(_._1)
  }

  /** Per-file digest sums of a SUBSET of the corpus's files: one scan
    * of exactly `paths`, grouped by source file — (path → sum mod M,
    * path → row count). `digest` must be the table's row-local
    * fingerprint column. */
  def fileSums(s: SparkSession, paths: Seq[String], digest: Column)
      : Map[String, (Long, Long)] = {
    if (paths.isEmpty) return Map.empty
    s.read.parquet(paths: _*)
      .select(srcCol.as("src"),
        digest.cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("h"))
      .groupBy(col("src"))
      .agg((sum(col("h")) % lit(graft.ArtifactStore.Mod))
        .cast("long").as("sum"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  // ------------------------------------------------------ manifest files

  /** One manifest line per file: `size mtime sum path` (path last —
    * it may contain spaces in no sane layout, but keeping it last
    * makes the split unambiguous anyway). */
  def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
                    p: org.apache.hadoop.fs.Path,
                    entries: Seq[(String, Long, Long, Long)]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      s".${p.getName}.tmp-${java.util.UUID.randomUUID.toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(entries.sortBy(_._1)
      .map { case (path, size, mtime, sum) => s"$size $mtime $sum $path" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    AtomicFiles.publishOrThrow(fs, tmp, p, recursiveTmp = false)
  }

  /** Read a manifest back: path → (size, mtime, sum). None when the
    * file is absent or unparseable (torn manifests are never
    * authoritative — callers fall back to the full path). */
  def readManifest(fs: org.apache.hadoop.fs.FileSystem,
                   p: org.apache.hadoop.fs.Path)
      : Option[Map[String, (Long, Long, Long)]] = {
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in).mkString
              finally in.close()
    try Some(txt.linesIterator.filter(_.nonEmpty).map { line =>
      val Array(size, mtime, sum, path) = line.split(" ", 4)
      path -> ((size.toLong, mtime.toLong, sum.toLong))
    }.toMap)
    catch { case _: Throwable => None }
  }
}
