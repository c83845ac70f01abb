package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming column profile (batch q111's cross-batch twin): the
  * snapshot is batch-boundary-invariant (counts are monoids, the
  * sketch merge is KMV's defining property) and its integer
  * statistics equal batch q111's bit-for-bit — the stream maintains
  * the same ANALYZE TABLE numbers the batch job recomputes.
  */
class StreamProfileSpec extends SparkSpec {
  import spark.implicits._

  private type Ev = (Long, Long, String, Double, String)

  private lazy val events: Seq[Ev] =
    spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_id", "user_id", "event_type", "value", "props")
      .as[Ev].collect().toSeq

  /** final snapshot per column = row with max n (counts only grow). */
  private def run(batches: Seq[Seq[Ev]], name: String)
    : Map[String, (Long, Long, Long, Long)] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val query = StreamProfile(stream.toDF()
        .toDF("event_id", "user_id", "event_type", "value", "props"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      spark.table(name).as[(String, Long, Long, Long, Long)].collect()
        .groupBy(_._1).view
        .mapValues(rs => { val m = rs.maxBy(_._2); (m._2, m._3, m._4, m._5) })
        .toMap
    } finally query.stop()
  }

  test("split invariance and integer parity with batch q111") {
    val one = run(Seq(events), "sp_one")
    val (a, rest) = events.splitAt(events.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    val three = run(Seq(a, b, c), "sp_three")
    assert(one == three, "profile depends on batch boundaries — not a monoid")

    // batch q111 emits (col_name, n, n_null, k_used, est_distinct, ...);
    // kth_hash is internal there, so compare the derived estimate — an
    // IEEE-exact function of (k_used, kth_hash), hence still bit-parity
    val batch = graft.queries.OpsQueries.columnProfile(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(one.keySet == batch.keySet)
    one.foreach { case (c, (n, nNull, kUsed, kth)) =>
      val (bn, bNull, bK, bEst) = batch(c)
      assert(n == bn && nNull == bNull, s"$c counts: stream ($n,$nNull) vs batch ($bn,$bNull)")
      assert(kUsed == bK, s"$c k_used: stream $kUsed vs batch $bK")
      val est = if (kUsed < StreamProfile.ProfK) kUsed.toDouble
        else (StreamProfile.ProfK - 1).toDouble /
          (kth.toDouble / 1152921504606846976L.toDouble)
      assert(java.lang.Double.compare(est, bEst) == 0,
        s"$c estimate: stream $est vs batch $bEst")
    }
  }
}
