package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming CDC materialization (batch q122's cross-batch twin): the
  * materialized row per key is determined by version comparison alone,
  * so it is invariant to batch boundaries AND to out-of-order change
  * delivery — and the non-tombstone snapshot equals batch q122's
  * changed rows exactly on the same change log.
  */
class StreamMergeSpec extends SparkSpec {
  import spark.implicits._

  private type Chg = (Long, Long, String, String)

  /** q122's deterministic change log, rebuilt from the base table. */
  private lazy val changes: Seq[Chg] = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val off = base.map(_._1).max + 1 // q122's derived insert-id offset
    base.flatMap { case (id, text) =>
      Seq(
        if (id % 3 == 0) Some((id, 1L, "U", s"v1 $text")) else None,
        if (id % 2 == 0) Some((id, 2L, "U", s"v2 $text")) else None,
        if (id % 5 == 0) Some((id + off, 2L, "I", s"new $text")) else None,
        if (id % 7 == 0) Some((id, 3L, "D", "")) else None).flatten
    }
  }

  /** final materialized row per key = the emission with max
    * (ver, op, text) — the merge order itself, so equal-version
    * emissions fold the same way the processor resolves them. */
  private def run(batches: Seq[Seq[Chg]], name: String)
    : Map[Long, (Long, String, String)] = withRocksDb {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Chg]
    val query = StreamMerge(stream.toDF().toDF("doc_id", "ver", "op", "text"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); query.processAllAvailable() }
      spark.table(name).as[(Long, Long, String, String)].collect()
        .groupBy(_._1).view
        .mapValues(rs => { val m = rs.maxBy(r => (r._2, r._3, r._4)); (m._2, m._3, m._4) })
        .toMap
    } finally query.stop()
  }

  test("order- and split-invariant materialization; parity with batch q122") {
    val inOrder = run(Seq(changes), "sm_one")
    // adversarial replay: reversed, split mid-key across three batches —
    // every v2 now arrives BEFORE its v1, deletes before their updates
    val rev = changes.reverse
    val (a, rest) = rev.splitAt(rev.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    val outOfOrder = run(Seq(a, b, c), "sm_ooo")
    assert(inOrder == outOfOrder,
      "materialization depends on delivery order — version LWW is broken")

    val batch = graft.queries.OpsQueries.mergeUpsert(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getString(2), r.getString(1))))
      .toMap
    // stream covers exactly the CHANGED keys; tombstones carry op D and
    // are absent from batch (which emits survivors incl. untouched)
    val live = inOrder.filter(_._2._2 != "D")
    assert(live.keySet == batch.filter(_._2._2 != "K").keySet,
      "live streamed keys must equal batch q122's changed keys")
    live.foreach { case (id, (ver, op, text)) =>
      assert(batch(id) == ((ver, op, text)), s"key $id: stream vs batch differ")
    }
    val tombstones = inOrder.count(_._2._2 == "D")
    assert(tombstones > 0 && tombstones == changes.count(_._3 == "D"),
      "every delete must surface as a tombstone")
  }

  test("equal-version ties resolve by (op, text) — arrival-order-invariant, " +
      "matching batch q122's max(struct)") {
    // two same-version changes to one key: the (ver, op, text) max must
    // win in either arrival order, same as max(struct(ver, op, text))
    val x: Chg = (1L, 2L, "U", "alpha")
    val y: Chg = (1L, 2L, "U", "zeta")
    val ab = run(Seq(Seq(x, y)), "sm_tie_ab")
    val ba = run(Seq(Seq(y, x)), "sm_tie_ba")
    assert(ab == ba, "equal-version tie depends on arrival order")
    assert(ab(1L) == ((2L, "U", "zeta")), s"tie winner: ${ab(1L)}")
    // and across batch boundaries (state already holds the loser/winner)
    val acrossLoserFirst = run(Seq(Seq(x), Seq(y)), "sm_tie_x_y")
    val acrossWinnerFirst = run(Seq(Seq(y), Seq(x)), "sm_tie_y_x")
    assert(acrossLoserFirst(1L) == ((2L, "U", "zeta")))
    assert(acrossWinnerFirst(1L) == ((2L, "U", "zeta")))
  }

  test("supplementary-plane tie matches Spark's UTF8 binary order, not UTF-16") {
    // U+10000 ("𐀀") sorts BELOW U+E000 in UTF-16 code units
    // (surrogates < U+E000) but ABOVE it in UTF-8 bytes (F0.. > EE..) —
    // the one divergence between Scala String '>' and batch q122's
    // max(struct) comparison. wins() must follow the batch order.
    val lo: Chg = (1L, 2L, "U", "\uE000")
    val hi: Chg = (1L, 2L, "U", "\uD800\uDC00") // U+10000
    val batchWinner = Seq(lo, hi).toDF("doc_id", "ver", "op", "text")
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct($"ver", $"op", $"text")).as("m"))
      .select($"m.text").as[String].head()
    assert(batchWinner == "\uD800\uDC00",
      "precondition: Spark's UTF8 order must pick U+10000")
    val ab = run(Seq(Seq(lo, hi)), "sm_supp_ab")
    val ba = run(Seq(Seq(hi, lo)), "sm_supp_ba")
    assert(ab(1L)._3 == batchWinner && ba(1L)._3 == batchWinner,
      s"stream tie winner diverges from batch: ${ab(1L)} / ${ba(1L)}")
  }
}
