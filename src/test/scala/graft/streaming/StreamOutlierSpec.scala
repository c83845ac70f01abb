package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming outlier statistics (batch q118's cross-batch twin): the
  * state is an exact integer monoid, so (1) the final snapshot is
  * invariant to how arrivals split across micro-batches, and (2) the
  * 3σ verdict counts derived from the streamed statistics equal batch
  * q118's output exactly — the stream is a live view of the audit the
  * backfill reconciles.
  */
class StreamOutlierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows: Seq[(String, Double)] =
    spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type", "value").as[(String, Double)]
      .collect().toSeq

  /** latest emitted row per group = the one with max n (counts grow). */
  private def run(batches: Seq[Seq[(String, Double)]], name: String)
    : Map[String, (Long, Long, Long)] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(String, Double)]
    val query = StreamOutlier(stream.toDF().toDF("event_type", "value"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      spark.table(name).as[(String, Long, Long, Long)].collect()
        .groupBy(_._1).view
        .mapValues(rs => { val m = rs.maxBy(_._2); (m._2, m._3, m._4) })
        .toMap
    } finally query.stop()
  }

  test("batch-split invariance and exact verdict parity with batch q118") {
    val one = run(Seq(rows), "so_one")
    val (a, rest) = rows.splitAt(rows.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    val three = run(Seq(a, b, c), "so_three")
    assert(one == three, "statistics depend on batch boundaries — not a monoid")

    // derive verdict counts from the streamed statistics and compare
    // against batch q118 bit-for-bit
    val batch = graft.queries.OpsQueries.outlierAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(one.keySet == batch.keySet)
    val cents = rows.groupBy(_._1).view.mapValues(_.map(t =>
      BigDecimal(t._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toLongExact)).toMap
    one.foreach { case (g, (n, s, q)) =>
      val (bn, bHi, bLo) = batch(g)
      assert(n == bn, s"$g count: stream $n vs batch $bn")
      val (bigN, bigS, bigQ) = (BigInt(n), BigInt(s), BigInt(q))
      val hi = cents(g).count { x =>
        val d = bigN * x - bigS; d > 0 && d * d > 9 * (bigN * bigQ - bigS * bigS)
      }
      val lo = cents(g).count { x =>
        val d = bigN * x - bigS; d < 0 && d * d > 9 * (bigN * bigQ - bigS * bigS)
      }
      assert((hi.toLong, lo.toLong) == ((bHi, bLo)),
        s"$g verdicts from streamed stats ($hi,$lo) vs batch ($bHi,$bLo)")
    }
  }
}
