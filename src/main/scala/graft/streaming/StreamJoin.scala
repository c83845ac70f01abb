package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join: attribution of purchases to the views
  * that preceded them (same user, view within [purchase − 30 min,
  * purchase]). This is the one Structured Streaming join shape the
  * engine did not yet exercise — both sides are unbounded, so matching
  * needs symmetric buffering, and correctness at scale depends on the
  * state being DROPPABLE: the time-range predicate plus a watermark on
  * BOTH sides lets Spark's StreamingSymmetricHashJoinExec compute, per
  * side, exactly how long a row can still find a partner, and evict it
  * afterwards.
  *
  * Spark-first: no custom state. The declarative join condition
  * (equi-key AND ts range) is what `StreamingSymmetricHashJoinExec`
  * needs to derive the two state-retention bounds — a
  * transformWithState re-implementation would buffer rows itself,
  * re-deriving eviction logic the engine already owns (and would lose
  * the codegen'd hash-join probe). Reference frames every stream op as
  * per-batch DStream transforms (reference `kmeans.py:60-66` trains on
  * each RDD independently); a cross-batch join like this has no
  * reference equivalent — it is part of the engine's widened streaming
  * surface alongside [[StreamResample]] / [[StreamHeavyHitters]].
  *
  * Scale posture: state is partitioned by user_id (the equi-key), so a
  * 1000-executor cluster shards it like any shuffle; per-side state is
  * bounded by (arrival rate × watermark + interval horizon), not by
  * stream length. The 1-hour watermark delay is the lateness SLA: a
  * view arriving later than that may be dropped rather than buffered
  * forever — the documented trade every production attribution
  * pipeline makes.
  *
  * Emits one row per (purchase, qualifying view) pair in append mode;
  * last-touch selection is a downstream max_by over purchase_id, kept
  * out of this operator so the join's state semantics stay testable in
  * isolation.
  */
object StreamJoin {

  /** events(ts, event_id, user_id, event_type, value) as a stream →
    * attribution pairs. Both inputs derive from ONE source DataFrame;
    * the two filtered branches still get independent watermarks. */
  def apply(events: DataFrame): DataFrame = {
    val views = events
      .where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", "1 hour")
    val purchases = events
      .where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value").as("amount"))
      .withWatermark("purchase_ts", "1 hour")
    purchases.join(
      views,
      expr("""v_user = p_user AND
              view_ts >= purchase_ts - INTERVAL 30 MINUTES AND
              view_ts <= purchase_ts"""))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("purchase_ts"), col("view_id"), col("view_ts"), col("amount"))
  }
}
