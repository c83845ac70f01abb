package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Driver-overhead audit: for every registered query, one timed run
  * (post-warmup) comparing WALL time against the sum of stage wall
  * times. The difference is driver-side work — Catalyst analysis/
  * optimization, codegen compilation, broadcast collection — which
  * stays CONSTANT as data grows and so silently dominates small-scale
  * measurements and serving-latency paths (the q164 lesson: 1.2 s of
  * stages inside a 4.7 s query, all of it planning over literal-heavy
  * trees). Output: one line per query, worst driver-share first.
  *
  * `runMain graft.PlanCost [sfDir] [minWallSec]`.
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val minWall = args.lift(1).map(_.toDouble).getOrElse(0.3)
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
    val stageMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        for (a <- sc.stageInfo.completionTime; b <- sc.stageInfo.submissionTime)
          stageMs.addAndGet(a - b)
    })
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    val rows = new ConcurrentLinkedQueue[(String, Double, Double)]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // listener events are async — poll until the counter quiesces
      // (BenchMetrics.settle's idiom; queries run strictly sequentially)
      def settle(): Long = {
        var prev = -1L; var cur = stageMs.get(); var i = 0
        while (cur != prev && i < 50) {
          prev = cur; Thread.sleep(50); cur = stageMs.get(); i += 1
        }
        cur
      }
      // warm run: artifact builds, codegen cache, broadcast reuse
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      settle()
      stageMs.set(0L)
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case _: Throwable => false }
      val wall = (System.nanoTime() - t0) / 1e9
      if (ok) rows.add((name, wall, settle() / 1e3))
    }
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq
    // stage walls OVERLAP when independent stages run concurrently
    // (two scans feeding a join, AQE broadcast builds), so stage-sum
    // can exceed wall; clamp the driver share at 0 — a clamped row
    // reads "no driver problem, stages ran in parallel", which is the
    // honest verdict for exactly those plans
    val flagged = all
      .filter { case (_, w, _) => w >= minWall }
      .sortBy { case (_, w, st) => -math.max(0.0, w - st) }
    println("=== driver-share audit (wall >= %.1fs), worst first ===".format(minWall))
    flagged.foreach { case (n, w, st) =>
      val d = math.max(0.0, w - st)
      println(f"$n%-28s wall=$w%6.2fs stages=$st%6.2fs driver=$d%6.2fs (${100 * d / w}%4.0f%%)")
    }
    println(f"TOTAL wall=${all.map(_._2).sum}%.1fs stages=${all.map(_._3).sum}%.1fs")
    spark.stop()
  }
}
