package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming drift histogram (batch q136's cross-batch twin): under the
  * frozen reference edges, the live counts are batch-boundary-invariant
  * and the final snapshot equals batch q136's current-half counts
  * exactly — the stream maintains the same PSI inputs the nightly
  * audit recomputes. Out-of-range values clamp to edge bins.
  */
class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  private type Ev = (String, Double)

  /** The batch audit's frame: global extents, midpoint split, and the
    * after-half rows the stream will replay. */
  private lazy val (vmn, vmx, afterHalf, expected) = {
    val rows = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type", s"$tsMicros AS tu",
        "CAST(value AS DECIMAL(18,2)) AS v").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).movePointRight(2).longValueExact()))
    val mn = rows.map(_._3).min; val mx = rows.map(_._3).max
    val tmn = rows.map(_._2).min; val tmx = rows.map(_._2).max
    val mid = tmn + (tmx - tmn) / 2
    val after = rows.filter(_._2 >= mid)
      .map(r => (r._1, r._3.toDouble / 100.0))
    val exp = graft.queries.AnalyticsQueries.psiDrift(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .filter(_._2 > 0).toMap
    (mn, mx, after.toSeq, exp)
  }

  /** latest snapshot per (grp, bin) = its max n (counts only grow). */
  private def run(batches: Seq[Seq[Ev]], name: String)
    : Map[(String, Long), Long] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val query = StreamDrift(stream.toDF().toDF("event_type", "value"),
        vmn, vmx)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      spark.table(name).as[(String, Long, Long)].collect()
        .groupBy(r => (r._1, r._2)).view
        .mapValues(_.map(_._3).max).toMap
    } finally query.stop()
  }

  test("split invariance; final snapshot equals batch q136's current half") {
    val one = run(Seq(afterHalf), "sd_one")
    val (a, rest) = afterHalf.splitAt(afterHalf.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    val three = run(Seq(a, b, c), "sd_three")
    assert(one == three, "drift counts depend on batch boundaries")
    assert(one == expected,
      "live histogram differs from batch q136's n_b counts")
  }

  test("values outside the frozen reference extent clamp to edge bins") {
    val got = run(Seq(Seq(("click", (vmx + 10000).toDouble / 100.0),
      ("click", (vmn - 10000).toDouble / 100.0))), "sd_clamp")
    assert(got == Map(("click", 9L) -> 1L, ("click", 0L) -> 1L),
      s"expected one count in each edge bin, got $got")
  }
}
