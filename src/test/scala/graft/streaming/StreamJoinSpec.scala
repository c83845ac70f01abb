package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Stream-stream interval join: the claims that matter are (1) symmetric
  * cross-batch buffering — a view from an EARLIER micro-batch still
  * matches a purchase arriving later (and vice versa: a purchase buffers
  * until its view arrives), (2) the interval predicate — views outside
  * [purchase − 30 min, purchase] never pair, and (3) bounded state —
  * once both watermarks pass a row's no-longer-matchable horizon the
  * state store DROPS it, which is what makes the operator runnable
  * forever at scale.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = 1700000000000L // fixed epoch millis, round number

  private def ev(id: Long, offsetMin: Long, user: Long, typ: String,
                 value: Double = 1.0): (Long, Timestamp, Long, String, Double) =
    (id, new Timestamp(T0 + offsetMin * 60000L), user, typ, value)

  /** Runs the join over the batches; returns the emitted pairs plus the
    * join-state row count observed after each batch settles (Spark may
    * append a no-data batch to apply an advanced watermark — the count
    * is read after processAllAvailable, i.e. post-eviction). */
  private def run(batches: Seq[Seq[(Long, Timestamp, Long, String, Double)]])
    : (Seq[(Long, Long, Long)], Seq[Long]) = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val name = s"sj_${System.nanoTime()}"
    val query = StreamJoin(stream.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val states = batches.map { b =>
        stream.addData(b); query.processAllAvailable()
        Option(query.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
      }
      val pairs = spark.table(name)
        .selectExpr("user_id", "purchase_id", "view_id")
        .as[(Long, Long, Long)].collect().toSeq.sorted
      (pairs, states)
    } finally query.stop()
  }

  test("view buffered across batches matches a later purchase; interval is enforced") {
    val batch1 = Seq(
      ev(1, 0, 7, "view"),       // matches: 10 min before the purchase
      ev(2, -45, 7, "view"),     // outside: 55 min before the purchase
      ev(3, 20, 7, "view"),      // outside: AFTER the purchase
      ev(4, 5, 9, "view"))       // other user
    val batch2 = Seq(
      ev(10, 10, 7, "purchase", 25.0),
      ev(11, 10, 8, "purchase", 9.0)) // user with no views: no pair
    val (pairs, _) = run(Seq(batch1, batch2))
    assert(pairs == Seq((7L, 10L, 1L)),
      s"expected exactly the in-window same-user pair, got $pairs")
  }

  test("purchase buffered across batches matches a late-arriving view") {
    val (pairs, _) = run(Seq(
      Seq(ev(10, 10, 7, "purchase", 25.0)),
      Seq(ev(1, 0, 7, "view"))))
    assert(pairs == Seq((7L, 10L, 1L)),
      "purchase-side buffering failed: the view arrived one batch later")
  }

  test("LEFT OUTER stream-stream join emits the unmatched view once its watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val views = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val v = views.toDF().toDF("user_id", "view_ts")
      .withWatermark("view_ts", "5 minutes")
    val c = clicks.toDF().toDF("click_user", "click_ts")
      .withWatermark("click_ts", "5 minutes")
    val joined = v.join(c,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 10 MINUTES"),
      "leftOuter")
      .select(col("user_id"), col("view_ts"), col("click_ts"))
    val query = joined.writeStream.format("memory")
      .queryName("ssj_outer").outputMode("append").start()
    try {
      def ts(minute: Int) = new Timestamp(T0 + minute * 60000L)
      views.addData((1L, ts(0)), (2L, ts(0)))
      clicks.addData((1L, ts(3))) // user 1 converts; user 2 never clicks
      query.processAllAvailable()
      // user 2's NULL row cannot be emitted yet — a matching click could
      // still arrive until the watermark passes view_ts + 10 min
      val early = spark.table("ssj_outer")
        .where(col("user_id") === 2L).count()
      assert(early == 0, "outer row must wait for the watermark")
      // push both watermarks far past the join horizon
      views.addData((99L, ts(120)))
      clicks.addData((99L, ts(120)))
      query.processAllAvailable()
      views.addData((98L, ts(125)))
      clicks.addData((98L, ts(125)))
      query.processAllAvailable()
      val u2 = spark.table("ssj_outer")
        .where(col("user_id") === 2L)
        .select(col("click_ts").isNull).as[Boolean].collect().toSeq
      assert(u2 == Seq(true),
        s"expected exactly one NULL-click row for user 2, saw ${u2.size}")
    } finally query.stop()
  }

  test("every qualifying view pairs; watermark passage evicts state") {
    val batch1 = Seq(ev(1, 0, 7, "view"), ev(2, 5, 7, "view"))
    val batch2 = Seq(ev(10, 10, 7, "purchase", 25.0))
    // advance BOTH sides' watermarks far past batch1/2 (each side's
    // watermark derives from its own filtered branch, so both types);
    // the post-watermark no-data batch then applies the eviction before
    // run() samples the state count
    val batch3 = Seq(ev(90, 600, 50, "view"), ev(91, 600, 51, "purchase"))
    val (pairs, states) = run(Seq(batch1, batch2, batch3))
    assert(pairs.filter(_._2 == 10L) == Seq((7L, 10L, 1L), (7L, 10L, 2L)),
      s"both in-window views must pair with the purchase, got $pairs")
    assert(states(1) == 3L,
      s"batches 1+2 should buffer 2 views + 1 purchase, got ${states(1)}")
    assert(states(2) == 2L,
      s"after the watermark passes, only batch3's 2 rows may remain " +
        s"(states: $states) — join state was not evicted")
  }
}
