package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized differential test for the native sorted-merge as-of join:
  * seeded random trade/quote sets with deliberately nasty shapes (key
  * skew, duplicate timestamps, keys missing on either side) are joined
  * through GraftAsOfJoinExec and compared row-for-row against an
  * in-memory brute-force reference. 20 rounds x up to ~200 rows, one
  * shared SparkSession.
  */
class AsOfJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)

  // brute force: latest right (by ts, then id) with ts <= left ts
  private def reference(trades: Seq[(String, Long, Long)],
      quotes: Seq[(String, Long, Long)]): Set[(Long, Long)] =
    trades.map { case (k, t, id) =>
      val m = quotes.filter(q => q._1 == k && q._2 <= t)
      val best = if (m.isEmpty) -1L
        else m.maxBy(q => (q._2, q._3))._3
      (id, best)
    }.toSet

  test("native as-of equals brute force on 20 seeded adversarial datasets") {
    for (round <- 1 to 20) {
      val keys = (0 until 1 + rnd.nextInt(6)).map(i => s"k$i")
      // skew: key k0 gets a burst of rows; duplicate timestamps common
      def side(n: Int, idBase: Long) = (0 until n).map { i =>
        val k = if (rnd.nextInt(3) == 0) "k0"
          else keys(rnd.nextInt(keys.length))
        (k, rnd.nextInt(20).toLong, idBase + i)
      }
      val trades = side(1 + rnd.nextInt(100), 1000L)
      val quotes = side(rnd.nextInt(100), 5000L)

      val out = AsOf.join(
          trades.toDF("tk", "tt", "tid"),
          AsOf.prefixed(quotes.toDF("k", "t", "id"), "q_"),
          Seq("tk" -> "q_k"), ("tt", "q_t"), rightTiebreak = Seq("q_id"))
        .select(col("tid"), coalesce(col("q_id"), lit(-1L)))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      assert(out == reference(trades, quotes), s"round $round diverged")
    }
  }
}
