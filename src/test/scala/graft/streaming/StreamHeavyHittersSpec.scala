package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming heavy hitters (batch q100's cross-batch twin): the
  * defining case is a token whose occurrences are spread thinly across
  * many micro-batches — no single batch makes it heavy, the merged
  * sketch state does. Also asserts the fixed state bound that replaces
  * per-token keyed state.
  */
class StreamHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Latest snapshot rows = per bucket, the rows carrying its max n
    * (n is monotone per bucket across batches). */
  private def latest(rows: Seq[(Long, Long, String, Long)])
    : Map[String, Long] = {
    val maxN = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    rows.filter { case (b, n, _, _) => n == maxN(b) }
      .map { case (_, _, t, c) => t -> c }.toMap
  }

  test("token spread 10-per-batch across 5 batches is retained with a lower-bound count") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[String]
      val query = StreamHeavyHitters(stream.toDF(), buckets = 4, capacity = 8)
        .writeStream.format("memory").queryName("shh_spread")
        .outputMode("append").start()
      try {
        // each batch: 10×hot + 15 fresh light tokens → hot is never a
        // within-batch majority, but dominates the merged stream
        (0 until 5).foreach { b =>
          stream.addData(Seq.fill(10)("hot") ++
            (0 until 15).map(i => s"light-$b-$i"))
          query.processAllAvailable()
        }
        val rows = spark.table("shh_spread")
          .as[(Long, Long, String, Long)].collect().toSeq
        val cands = latest(rows)
        // total n = 125; hot freq 50 > 125/(8+1): must be retained
        assert(cands.contains("hot"), s"hot lost from $cands")
        // count is a lower bound within the MG error, never an overcount
        assert(cands("hot") <= 50 && cands("hot") >= 50 - 125 / 9)
      } finally query.stop()
    }
  }

  test("state and emissions stay bounded by buckets × capacity under vocab blowup") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[String]
      val query = StreamHeavyHitters(stream.toDF(), buckets = 2, capacity = 4)
        .writeStream.format("memory").queryName("shh_bounded")
        .outputMode("append").start()
      try {
        (0 until 3).foreach { b =>
          stream.addData((0 until 100).map(i => s"v$b-$i"))
          query.processAllAvailable()
        }
        val rows = spark.table("shh_bounded")
          .as[(Long, Long, String, Long)].collect().toSeq
        // every snapshot (not just the latest) respects the cap
        rows.groupBy(r => (r._1, r._2)).foreach { case (k, snap) =>
          assert(snap.size <= 4, s"bucket/batch $k emitted ${snap.size} candidates")
        }
      } finally query.stop()
    }
  }
}
