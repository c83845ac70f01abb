package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming exact KS (batch q137's cross-batch twin): the per-(grp, v)
  * half counts are batch-boundary-invariant, and ksOf over the final
  * snapshot equals batch q137 exactly — the live monitor and the
  * nightly audit agree on the same integer pieces.
  */
class StreamKsDriftSpec extends SparkSpec {
  import spark.implicits._

  private type Ev = (String, Long, Double)

  /** All events with micro-epoch ts, plus q137's frozen midpoint. */
  private lazy val (rows, tmid) = {
    val r = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type", s"$tsMicros AS tu",
        "CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value")
      .as[Ev].collect().toSeq
    val tmn = r.map(_._2).min
    val tmx = r.map(_._2).max
    (r, tmn + (tmx - tmn) / 2)
  }

  /** Run batches through the stream, then take the LATEST count pair
    * per (grp, v) — counts only grow, so max = latest. */
  private def run(batches: Seq[Seq[Ev]], name: String) = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val query = StreamKsDrift(
        stream.toDF().toDF("event_type", "tu", "value"), tmid)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      spark.table(name).as[(String, Long, Long, Long)].collect()
        .groupBy(r => (r._1, r._2)).view
        .mapValues(rs => (rs.map(_._3).max, rs.map(_._4).max)).toMap
    } finally query.stop()
  }

  test("split invariance; ksOf(final snapshot) equals batch q137") {
    val one = run(Seq(rows), "ks_one")
    val (a, rest) = rows.splitAt(rows.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    val three = run(Seq(a, b, c), "ks_three")
    assert(one == three, "KS half counts depend on batch boundaries")

    val snap = one.toSeq
      .map { case ((g, v), (ca, cb)) => (g, v, ca, cb) }
      .toDF("grp", "v", "c_a", "c_b")
    val live = StreamKsDrift.ksOf(snap).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val batch = graft.queries.AnalyticsQueries.ksDrift(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(live == batch, "live KS pieces differ from batch q137")
    assert(batch.values.exists(_._3 > 0L),
      "witness: some group must show a non-zero KS distance")
  }
}
