package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // Let AQE re-plan (coalesce) over cached/persisted frames: the
      // default-false compatibility flag pins every stage over a
      // persisted relation to the static shuffle-partition count, which
      // turns iterative analytics over persisted graphs (q91/q125/
      // q148/q154) into fleets of near-empty tasks — measured 6.8 s ->
      // 4.2 s on q91 at sf0.1. Values are unaffected; only partition
      // counts adapt to data size, which is the 100 TB posture anyway.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated subset for local iteration (mirrors
    // Bench's SPARK_GRAFT_BENCH_ONLY); the driver sets nothing and
    // always dumps the full surface.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY").map(_.split(",").toSet)
    // A throwing query must leave a durable trace, not just a stderr line:
    // r3's q90 died here and silently vanished from the correctness
    // artifact (no parquet => no entry). Each failure writes a
    // $outDir/$name.error marker (check_oracle.py and the driver's
    // missing-parquet path both turn it into a red entry) and the full
    // list is echoed to stdout at the end.
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // a marker from a PREVIOUS run into the same outDir must not
      // outlive a now-passing query (overwrite-mode reuse + the
      // VERIFY_ONLY iteration path both anticipate outDir reuse)
      Files.deleteIfExists(Paths.get(s"$outDir/$name.error"))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Files.writeString(Paths.get(s"$outDir/$name.error"),
          s"$name: ${e.toString}\n")
      }
    }
    if (failures.nonEmpty)
      println(s"[verify] FAILED queries (${failures.size}): " +
        failures.sorted.mkString(", "))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // durable run summary (r4 verdict item 2's Verify half): survives
    // stdout truncation and records what this dump actually covered
    val ran = SparkEntry.queries.keys
      .filter(n => only.forall(_.contains(n))).toSeq.sorted
    Files.writeString(Paths.get(s"$outDir/verify_summary.json"),
      s"""{"n_queries":${ran.size},"n_failed":${failures.size},""" +
        s""""failed":${failures.sorted.map(q).mkString("[", ",", "]")},""" +
        s""""sf_dir":${q(sfDir)}}\n""")
    spark.stop()
  }
}
