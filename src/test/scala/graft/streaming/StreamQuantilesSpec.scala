package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming quantile bounds (batch q104's cross-batch twin): the
  * defining case is a quantile that is only correct because state
  * merged EVERY batch — a last-batch-only histogram would bound a
  * different order statistic. Also asserts the interval guarantee
  * (true running quantile inside every emitted bound, width ≤ one
  * bucket), the exact-rank overflow behavior, and the fixed state
  * bound.
  */
class StreamQuantilesSpec extends SparkSpec {
  import spark.implicits._

  /** rows emitted with the max n per (grp, ql) = the latest snapshot. */
  private def latest(rows: Seq[(String, String, Long, Double, Double)])
    : Map[(String, String), (Long, Double, Double)] = {
    val maxN = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).max).toMap
    rows.filter { case (g, q, n, _, _) => n == maxN((g, q)) }
      .map { case (g, q, n, lo, hi) => (g, q) -> ((n, lo, hi)) }.toMap
  }

  private def exactQ(vs: Seq[Double], qp: Long): Double = {
    val sorted = vs.sorted
    val r = (qp * sorted.length + 99L) / 100L
    sorted((r - 1).toInt)
  }

  test("every emitted bound contains the exact running quantile, width <= one bucket") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(String, Double)]
      val query = StreamQuantiles(stream.toDF(), lo = 0.0, hi = 100.0, buckets = 50)
        .writeStream.format("memory").queryName("sq_bounds")
        .outputMode("append").start()
      try {
        // batch 1 is all small values, batch 2 all large: the running
        // p90 after batch 2 differs from batch 2's own p90 — only
        // merged state bounds the right order statistic
        val b1 = (1 to 80).map(i => ("a", i % 40 + 0.5))
        val b2 = (1 to 20).map(i => ("a", 90.0 + (i % 5)))
        val seen = scala.collection.mutable.ArrayBuffer.empty[Double]
        for (batch <- Seq(b1, b2)) {
          stream.addData(batch)
          query.processAllAvailable()
          seen ++= batch.map(_._2)
          val snap = latest(spark.table("sq_bounds")
            .as[(String, String, Long, Double, Double)].collect().toSeq)
          for ((ql, qp) <- StreamQuantiles.Targets) {
            val (n, blo, bhi) = snap(("a", ql))
            assert(n == seen.size.toLong, s"$ql n")
            val truth = exactQ(seen.toSeq, qp)
            assert(blo <= truth && truth < bhi,
              s"$ql: true $truth outside [$blo, $bhi) after ${seen.size}")
            assert(bhi - blo <= 2.0 + 1e-9, s"$ql bound width ${bhi - blo}")
          }
        }
        // cross-batch proof: batch 2 alone has p50 >= 90, merged p50
        // must still sit in the small-value region
        val snap = latest(spark.table("sq_bounds")
          .as[(String, String, Long, Double, Double)].collect().toSeq)
        assert(snap(("a", "p50"))._3 <= 42.0,
          "merged p50 leaked into the last batch's range")
      } finally query.stop()
    }
  }

  test("out-of-range ranks report an unbounded side instead of clamping") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(String, Double)]
      val query = StreamQuantiles(stream.toDF(), lo = 0.0, hi = 10.0, buckets = 10)
        .writeStream.format("memory").queryName("sq_overflow")
        .outputMode("append").start()
      try {
        // 60% of arrivals above hi: p90 and p99 fall in the overflow
        stream.addData((1 to 4).map(i => ("g", i.toDouble)) ++
          (1 to 6).map(i => ("g", 1000.0 + i)))
        query.processAllAvailable()
        val snap = latest(spark.table("sq_overflow")
          .as[(String, String, Long, Double, Double)].collect().toSeq)
        assert(snap(("g", "p90")) == ((10L, 10.0, Double.PositiveInfinity)))
        assert(snap(("g", "p99")) == ((10L, 10.0, Double.PositiveInfinity)))
        // p50 (rank 5) is still in-range: bucket [4, 5) holds value 4.0?
        // rank 5 = the 5th smallest = first overflow? values 1..4 then
        // 1006.., so rank 5 is overflow too
        assert(snap(("g", "p50"))._2 == 10.0)
      } finally query.stop()
    }
  }

  test("state stays buckets+2 longs per group however many values arrive") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[(String, Double)]
      val query = StreamQuantiles(stream.toDF(), lo = 0.0, hi = 1.0, buckets = 8)
        .writeStream.format("memory").queryName("sq_state")
        .outputMode("append").start()
      try {
        (0 until 3).foreach { b =>
          stream.addData((1 to 500).map(i => ("g", (i % 997) / 997.0)))
          query.processAllAvailable()
        }
        // emissions per batch = |targets| per touched group, not O(values)
        val rows = spark.table("sq_state").collect()
        assert(rows.length == 3 * StreamQuantiles.Targets.size)
      } finally query.stop()
    }
  }
}
