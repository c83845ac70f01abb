package graft.sources

import java.nio.file.Files
import java.util.concurrent.atomic.LongAdder

import graft.SparkSpec
import graft.queries.OpsQueries
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end proof of the Z-order pipeline (r6 verdict item 2): the
  * rewrite is EXECUTED — real parquet files on disk — and q127's
  * skipping predictions are checked against Spark's OWN scan behavior,
  * measured as task input records. The cell-table model and the file
  * footers must tell the same story, or the layout's payoff claim is
  * fiction.
  *
  * Why task `inputMetrics.recordsRead` is the right instrument: the
  * parquet vectorized reader prunes whole rowgroups/pages via footer
  * min/max before decoding anything, so records read = rows in
  * SURVIVING rowgroups — exactly the "rows_scanned" a footer-overlap
  * model predicts. (The post-scan FilterExec re-evaluates the
  * predicate but cannot change what was read.) Each written file here
  * is one rowgroup/one page, so page- and rowgroup-granularity
  * pruning coincide and the prediction must match EXACTLY, not
  * approximately.
  */
class ZorderRewriteSpec extends SparkSpec {

  /** Sum of inputMetrics.recordsRead across tasks, BenchMetrics'
    * settle-polling idiom (the listener bus is async). */
  private class InputRecords extends SparkListener {
    val records = new LongAdder
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (e.taskMetrics != null) records.add(e.taskMetrics.inputMetrics.recordsRead)
    def settle(): Long = {
      var prev = -1L
      var cur = records.sum()
      var i = 0
      while (cur != prev && i < 50) {
        prev = cur; Thread.sleep(50); cur = records.sum(); i += 1
      }
      cur
    }
  }

  /** Execute `df` (noop sink: full plan, rows discarded) and return how
    * many records its tasks actually read from files. */
  private def rowsRead(df: DataFrame): Long = {
    val l = new InputRecords
    spark.sparkContext.addSparkListener(l)
    try {
      df.write.format("noop").mode("overwrite").save()
      l.settle()
    } finally spark.sparkContext.removeSparkListener(l)
  }

  private lazy val report = OpsQueries.skippingReport(spark, sfDir).collect()
  private lazy val rowsTotal = report.head.getAs[Long]("rows_total")

  private def predicate(predCol: String, lo: Long, hi: Long) =
    col(predCol).between(lo, hi)

  test("per-cell layout: every q127 prediction matches the real scan") {
    val out = Files.createTempDirectory("zorder").toString + "/bycell"
    ZorderPublish.writeByCell(spark, sfDir, out)

    // one parquet file per Morton cell directory
    val files = spark.read.parquet(out)
      .select(input_file_name().as("f")).distinct().count()
    val nCells = report.head.getAs[Long]("cells_total")
    assert(files == nCells, s"expected $nCells files (one per cell), got $files")

    // instrument sanity: an unfiltered scan reads every row
    assert(rowsRead(spark.read.parquet(out).select("l_partkey")) == rowsTotal)

    // all 16 octile predicates: actual rows read == predicted
    // rows_scanned. Files are all-or-nothing at footer granularity, so
    // this equality also pins cells_scanned: any extra or missing cell
    // would shift the row count by that cell's n.
    report.foreach { r =>
      val predCol = r.getAs[String]("pred_col")
      val lo = r.getAs[Long]("lo"); val hi = r.getAs[Long]("hi")
      val predicted = r.getAs[Long]("rows_scanned")
      val actual = rowsRead(spark.read.parquet(out)
        .where(predicate(predCol, lo, hi)))
      assert(actual == predicted,
        s"$predCol octile ${r.getAs[Long]("b")} [$lo,$hi]: " +
          s"scan read $actual rows, q127 predicted $predicted")
      // the layout actually skips — an octile never costs a full scan
      assert(actual < rowsTotal,
        s"$predCol [$lo,$hi] read the whole table — no pruning happened")
    }
  }

  test("q120's 8-file layout: scans match the file-grain predictions") {
    val out = Files.createTempDirectory("zorder").toString + "/byfile"
    ZorderPublish.writeByFile(spark, sfDir, out)
    val stats = ZorderPublish.fileStats(spark, sfDir).collect()

    // one parquet file per file_id directory, ≤ 8 of them
    val files = spark.read.parquet(out)
      .select(input_file_name().as("f")).distinct().count()
    assert(files == stats.length && files <= 8,
      s"expected ${stats.length} files, got $files")

    // written row counts per file match q120's plan
    val actualN = spark.read.parquet(out).groupBy("file_id").count()
      .collect().map(r => r.getAs[Long]("file_id") -> r.getAs[Long]("count")).toMap
    stats.foreach { f =>
      val id = f.getAs[Long]("file_id")
      assert(actualN(id) == f.getAs[Long]("n"),
        s"file $id holds ${actualN(id)} rows, plan said ${f.getAs[Long]("n")}")
    }

    // the same 16-predicate workload at file-footer granularity:
    // predicted = Σ n over files whose [min,max] overlap the range,
    // computed from the CELL table (q117 ∘ q120) — the scan must agree.
    report.foreach { r =>
      val predCol = r.getAs[String]("pred_col")
      val lo = r.getAs[Long]("lo"); val hi = r.getAs[Long]("hi")
      val predicted = stats.filter { f =>
        val (mn, mx) =
          if (predCol == "l_partkey")
            (f.getAs[Long]("min_p"), f.getAs[Long]("max_p"))
          else (f.getAs[Long]("min_s"), f.getAs[Long]("max_s"))
        mn <= hi && mx >= lo
      }.map(_.getAs[Long]("n")).sum
      val actual = rowsRead(spark.read.parquet(out)
        .where(predicate(predCol, lo, hi)))
      assert(actual == predicted,
        s"$predCol [$lo,$hi]: scan read $actual rows, " +
          s"file-grain footers predicted $predicted")
    }
  }
}
