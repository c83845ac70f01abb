package graft.queries

import graft.Tables
import graft.llm.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Event-time windowing (SURVEY §2.10) exercised in batch form so the
  * exact same operators used by the streaming paths get DuckDB oracles:
  * tumbling windows via `window()`, session windows via
  * `session_window()`, and frozen-weight linear inference (M6) as a pure
  * column expression over embeddings.
  *
  * Timestamps never leave a query raw — formatted as UTC strings
  * (SURVEY §5.1). Tumbling buckets align identically in both engines:
  * Spark aligns to the epoch, DuckDB's `time_bucket` to 2000-01-01, and
  * the two origins differ by an exact multiple of five minutes.
  */
object WindowQueries {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  /** q39 — tumbling 5-minute event-time windows per event_type. */
  def tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType18_6)).cast(DoubleType).as("sum_value"))
      .select(date_format(col("w.start"), TsFmt).as("w_start"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  private def DecimalType18_6 = org.apache.spark.sql.types.DecimalType(18, 6)

  /** q40 — session windows per user: a session breaks after 30 idle
    * minutes; Spark's `session_window` in batch mode vs the classic
    * gaps-and-islands SQL formulation. */
  def sessions(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType18_6)).cast(DoubleType).as("sum_value"))
      .select(col("user_id"),
        date_format(col("w.start"), TsFmt).as("session_start"),
        col("cnt"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Deterministic pseudo-random frozen weights for q41 (integer-derived
    * rationals — identical literals on both engines). */
  private val FrozenW: Seq[Double] =
    (0 until VectorOps.Dim).map(j => (((j * 2654435761L) % 1000L) - 500L) / 1000.0)

  /** q41 — frozen-weight linear inference (the reference's M6
    * `model.predict` with a loaded pickle, `TESTING .py:76-77`) as a
    * column expression: score = w·x, prediction = score > 0. */
  def linearScore(s: SparkSession, dir: String): DataFrame = {
    val w = array(FrozenW.map(lit): _*)
    val score = VectorOps.dot(VectorOps.toDoubleArr(col("embedding")), w)
    Tables.embeddings(s, dir)
      .select(col("vec_id"), score.as("score"),
        when(score > 0, 1L).otherwise(0L).as("prediction"), col("label"))
      .orderBy(col("vec_id"))
  }

  /** q42 — prediction-quality aggregation on top of q41: confusion cells
    * against the stored label (binary: label == 0 vs != 0), i.e. the A3
    * metric aggregation shape with an oracle. */
  def scoreConfusion(s: SparkSession, dir: String): DataFrame = {
    val w = array(FrozenW.map(lit): _*)
    val score = VectorOps.dot(VectorOps.toDoubleArr(col("embedding")), w)
    Tables.embeddings(s, dir)
      .select(when(col("label") === 0, 0L).otherwise(1L).as("y"),
        when(score > 0, 1L).otherwise(0L).as("pred"))
      .groupBy(col("y"), col("pred")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("y"), col("pred"))
  }

  /** q121 — score calibration on top of q41 (the eval a classifier
    * rollout runs after q42's confusion: does predicted score track
    * empirical positive rate?): scores quantize to micro-units
    * (⌊score·10⁶⌋ — an exact floor of bit-identical IEEE doubles, the
    * q106/q116 convention), bucket into 10 equi-width bins over the
    * observed [min, max] with exact integer division (q117's
    * bucketize), and each bin emits (n, n_pos, min/max quantized
    * score) — the positive RATE is the consumer's one lossy division,
    * left out so no float crosses engines. Equi-width rather than
    * decile bins keeps the cut points integer-exact; a decile variant
    * would ride q104's exact-quantile machinery.
    *
    * Scale shape: one scalar min/max agg broadcast back, then one
    * partial-aggregated pass to 10 rows — two scans, no sort, no
    * row-matching join, q118's audit shape.
    */
  def scoreCalibration(s: SparkSession, dir: String): DataFrame = {
    val w = array(FrozenW.map(lit): _*)
    val score = VectorOps.dot(VectorOps.toDoubleArr(col("embedding")), w)
    val base = Tables.embeddings(s, dir)
      .select(floor(score * lit(1000000.0)).cast(LongType).as("sc"),
        when(col("label") === 0, 0L).otherwise(1L).as("pos"))
    val ext = base.agg(min(col("sc")).as("mn"), max(col("sc")).as("mx"))
    base.crossJoin(broadcast(ext))
      .withColumn("bucket", expr("((sc - mn) * 10) div (mx - mn + 1)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        min(col("sc")).as("min_sc"), max(col("sc")).as("max_sc"))
      .orderBy(col("bucket"))
  }

  /** q44 — sliding windows (10-minute length, 5-minute slide): every
    * event lands in exactly two windows; the oracle reproduces that by
    * unnesting the two candidate window starts per event. */
  def sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType18_6)).cast(DoubleType).as("sum_value"))
      .select(date_format(col("w.start"), TsFmt).as("w_start"),
        col("event_type"), col("cnt"), col("sum_value"))
      .orderBy(col("w_start"), col("event_type"))

  /** q45 — approx_count_distinct (HLL++) next to the exact count: the
    * approximate value has no cross-engine oracle (different sketches),
    * so this query is declared without one (rows-only check); the spec
    * asserts the estimate lands within the documented error bound. */
  def approxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .orderBy(col("event_type"))

  /** q61 — AS-OF join: each click matched to the latest view by the same
    * user at or before the click (left: unmatched clicks keep NULLs).
    *
    * Spark lacks a native as-of join; the scale-correct composition is
    * the UNION + partitioned-window trick: tag both sides, union, and
    * take `last(view, ignoreNulls)` over (user_id) ordered by
    * (ts, side, event_id) up to the current row. ONE shuffle on user_id
    * and a partition-local sort — never a per-key subquery or a range
    * crossJoin, and no unpartitioned window. Views order before clicks
    * on ts ties, giving the ASOF `<=` semantics exactly. Oracle: DuckDB's
    * native ASOF LEFT JOIN ((user_id, ts) is unique in testdata, so the
    * match is unambiguous). */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val views = e.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("is_click"))
    val clicks = e.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("is_click"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_click"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    views.unionByName(clicks)
      .withColumn("view_id",
        last(when(col("is_click") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("view_ts",
        last(when(col("is_click") === 0, col("ts")), ignoreNulls = true).over(w))
      .where(col("is_click") === 1)
      // unmatched clicks keep LEFT semantics but surface as -1, not NULL:
      // the compare harness reads nullable int64 as NaN floats on both
      // sides and NaN never equals NaN
      .select(col("event_id").as("click_id"), col("user_id"),
        coalesce(col("view_id"), lit(-1L)).as("view_id"),
        coalesce(unix_micros(col("ts")) - unix_micros(col("view_ts")), lit(-1L))
          .as("gap_us"))
      .orderBy(col("click_id"))
  }

  /** q63 — range self-join, bucketed: pairs of same-user events where b
    * follows a within 5 minutes.
    *
    * The naive formulation is an inequality-only join (per-user
    * cross × range filter — quadratic in events-per-user). Here the
    * range condition is turned into an EQUI-join: bucket ts into
    * 5-minute cells, explode the LATER side to its own and its
    * preceding bucket, join on (user_id, bucket), then apply the exact
    * range predicate. Any qualifying pair spans at most one bucket
    * boundary, so exactly one of the two probes matches — no distinct
    * needed — and the join cost is Σ per-(user, bucket) occupancy², not
    * per-user². The oracle runs the naive range join. */
  def rangeJoinBucketed(s: SparkSession, dir: String): DataFrame = {
    val FiveMinUs = 300000000L
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("bkt", expr(s"us div $FiveMinUs"))
    val probes = e.withColumn("probe",
      explode(array(col("bkt") - 1, col("bkt"))))
    val delta = col("b.us") - col("a.us")
    e.as("a").join(probes.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.bkt") === col("b.probe") &&
          delta > 0L && delta <= FiveMinUs)
      .select(col("a.event_id").as("a_id"), col("b.event_id").as("b_id"),
        delta.as("delta_us"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** q70 — ordered funnel: users reaching view → click-after-view →
    * purchase-after-that-click. Three per-user conditional-min
    * aggregations chained through joins — every stage shuffles on the
    * SAME user_id key (one co-partitioned lineage, no windows over the
    * full event set, no per-user subqueries). */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
    val tv = e.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ts"))).as("tv"))
      .where(col("tv").isNotNull)
    val tc = e.join(tv, "user_id")
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "click" && col("ts") > col("tv"),
        col("ts"))).as("tc"))
      .where(col("tc").isNotNull)
    val tp = e.join(tc, "user_id")
      .groupBy("user_id")
      .agg(min(when(col("event_type") === "purchase" && col("ts") > col("tc"),
        col("ts"))).as("tp"))
      .where(col("tp").isNotNull)
    val stages = Seq(
      ("1_view", tv), ("2_click_after_view", tc), ("3_purchase_after_click", tp))
    stages.map { case (name, df) =>
      df.agg(count(lit(1)).as("users")).select(lit(name).as("stage"), col("users"))
    }.reduce(_.unionByName(_)).orderBy(col("stage"))
  }

  /** q84 — q61's AS-OF join on the NATIVE whole-operator path
    * (graft.plans: GraftAsOfJoin logical node → GraftStrategies →
    * GraftAsOfJoinExec sorted-merge physical operator, injected via
    * GraftExtensions). Same semantics, same DuckDB ASOF oracle as q61;
    * the plan is two exchanges + two sorts + ONE single-pass merge with
    * O(1) state per partition — no window chain, no candidate
    * materialization (AsOfJoinSpec pins result parity with q61 and the
    * plan shape). */
  def asofNative(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.AsOf
    val e = Tables.events(s, dir)
    val clicks = e.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = AsOf.prefixed(
      e.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id")), "v_")
    AsOf.join(clicks, views, Seq("user_id" -> "v_user_id"), ("ts", "v_ts"),
        rightTiebreak = Seq("v_event_id"))
      .select(col("event_id").as("click_id"), col("user_id"),
        coalesce(col("v_event_id"), lit(-1L)).as("view_id"),
        coalesce(unix_micros(col("ts")) - unix_micros(col("v_ts")), lit(-1L))
          .as("gap_us"))
      .orderBy(col("click_id"))
  }

  /** q95 — cohort retention, the standard product-analytics rollup over
    * an event log: users cohort by their FIRST active day, each later
    * active day contributes to (cohort_day, day_offset), and retention
    * is the integer-ratio share of the cohort still active — the
    * triangular matrix every retention dashboard draws. Day arithmetic
    * is exact BIGINT epoch-day division (no engine date-function
    * drift), and retention is a single integer-ratio double.
    *
    * Scale shape: the first-day aggregation and the activity join key
    * on user_id — ONE shuffle partitioning reused by both (q93's
    * pattern); the (cohort, offset) rollup aggregates the already-
    * deduplicated (user, day) pairs; cohort sizes are a
    * days-in-history-bounded broadcast.
    */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(s, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val cohort = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val sizes = cohort.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    val active = days.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    active.join(broadcast(sizes), Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast(DoubleType) / col("cohort_size").cast(DoubleType))
          .as("retention"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** q108 — OHLC time-bucket downsampling (resample-to-the-hour), the
    * operator that turns years of raw events into chartable/joinable
    * aggregates: per (event_type, hour) the first, max, min, and last
    * value plus count and exact sum. Open/close are arg-min/arg-max
    * aggregates over a PACKED total-order key — micros·2³² + event_id
    * in DECIMAL(38,0) (HUGEINT on the oracle side), so first/last are
    * deterministic even under timestamp ties — which makes the whole
    * query ONE partial-aggregated groupBy: no window, no per-bucket
    * sort, map-side combine does almost all the work. The window-sort
    * formulation (row_number asc/desc per bucket) would sort every
    * bucket's rows in one task; min_by ships one (key, value) pair per
    * partition per bucket.
    */
  def resampleOhlc(s: SparkSession, dir: String): DataFrame = {
    val packed = unix_micros(col("ts"))
      .cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
      lit(4294967296L) + col("event_id")
    Tables.events(s, dir)
      .select(col("event_type"),
        date_format(date_trunc("hour", col("ts")), TsFmt).as("h"),
        col("value"), packed.as("pk"))
      .groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"),
        min_by(col("value"), col("pk")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("pk")).as("close"),
        sum(col("value").cast(DecimalType18_6)).cast(DoubleType).as("sum_value"))
      .orderBy(col("event_type"), col("h"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q108_resample_ohlc"  -> resampleOhlc,
    "q95_cohort_retention" -> cohortRetention,
    "q70_funnel"          -> funnel,
    "q84_asof_native"     -> asofNative,
    "q63_range_join_bucket" -> rangeJoinBucketed,
    "q39_tumbling_window" -> tumbling,
    "q40_session_window"  -> sessions,
    "q41_linear_score"    -> linearScore,
    "q121_score_calibration" -> scoreCalibration,
    "q42_score_confusion" -> scoreConfusion,
    "q44_sliding_window"  -> sliding,
    "q45_approx_distinct" -> approxDistinct,
    "q61_asof_join"       -> asofJoin
  )

  private val frozenWSql = FrozenW.map(_.toString).mkString("[", ", ", "]")
  private val scoreSql =
    s"list_dot_product(embedding::DOUBLE[], $frozenWSql::DOUBLE[])"

  val oracles: Map[String, String] = Map(
    "q108_resample_ohlc" ->
      """SELECT event_type,
        |       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h,
        |       count(*)::BIGINT AS n,
        |       arg_min(value, epoch_us(ts)::HUGEINT * 4294967296 + event_id)
        |         AS open,
        |       max(value) AS high, min(value) AS low,
        |       arg_max(value, epoch_us(ts)::HUGEINT * 4294967296 + event_id)
        |         AS close,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY event_type, date_trunc('hour', ts)
        |ORDER BY event_type, h""".stripMargin,

    "q95_cohort_retention" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id),
        |sz AS (SELECT cohort_day, count(*)::BIGINT AS cohort_size
        |       FROM c GROUP BY cohort_day),
        |a AS (
        |  SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
        |         count(*)::BIGINT AS n_active
        |  FROM d JOIN c USING (user_id)
        |  GROUP BY c.cohort_day, d.day - c.cohort_day)
        |SELECT a.cohort_day, a.day_offset, a.n_active, sz.cohort_size,
        |       a.n_active::DOUBLE / sz.cohort_size::DOUBLE AS retention
        |FROM a JOIN sz USING (cohort_day)
        |ORDER BY a.cohort_day, a.day_offset""".stripMargin,

    "q39_tumbling_window" ->
      """SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts), '%Y-%m-%d %H:%M:%S') AS w_start,
        |       event_type, count(*) AS cnt,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY time_bucket(INTERVAL 5 MINUTE, ts), event_type
        |ORDER BY w_start, event_type""".stripMargin,

    "q40_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                   > INTERVAL 30 MINUTE
        |              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM sessions
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q41_linear_score" ->
      s"""SELECT vec_id, $scoreSql AS score,
         |       CASE WHEN $scoreSql > 0 THEN 1 ELSE 0 END::BIGINT AS prediction,
         |       label
         |FROM embeddings ORDER BY vec_id""".stripMargin,

    "q121_score_calibration" ->
      s"""WITH base AS (
         |  SELECT CAST(floor($scoreSql * 1000000) AS BIGINT) AS sc,
         |         (CASE WHEN label = 0 THEN 0 ELSE 1 END)::BIGINT AS pos
         |  FROM embeddings),
         |ext AS (SELECT min(sc) AS mn, max(sc) AS mx FROM base)
         |SELECT ((sc - mn) * 10) // (mx - mn + 1) AS bucket,
         |       count(*)::BIGINT AS n, sum(pos)::BIGINT AS n_pos,
         |       min(sc) AS min_sc, max(sc) AS max_sc
         |FROM base, ext
         |GROUP BY bucket
         |ORDER BY bucket""".stripMargin,

    "q42_score_confusion" ->
      s"""SELECT (CASE WHEN label = 0 THEN 0 ELSE 1 END)::BIGINT AS y,
         |       (CASE WHEN $scoreSql > 0 THEN 1 ELSE 0 END)::BIGINT AS pred,
         |       count(*) AS cnt
         |FROM embeddings
         |GROUP BY 1, 2
         |ORDER BY y, pred""".stripMargin,

    "q70_funnel" ->
      """WITH tv AS (
        |  SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS tv
        |  FROM events GROUP BY user_id HAVING tv IS NOT NULL),
        |tc AS (
        |  SELECT e.user_id,
        |         min(CASE WHEN e.event_type = 'click' AND e.ts > tv.tv THEN e.ts END) AS tc
        |  FROM events e JOIN tv ON e.user_id = tv.user_id
        |  GROUP BY e.user_id HAVING tc IS NOT NULL),
        |tp AS (
        |  SELECT e.user_id,
        |         min(CASE WHEN e.event_type = 'purchase' AND e.ts > tc.tc THEN e.ts END) AS tp
        |  FROM events e JOIN tc ON e.user_id = tc.user_id
        |  GROUP BY e.user_id HAVING tp IS NOT NULL)
        |SELECT stage, users FROM (
        |  SELECT '1_view' AS stage, count(*) AS users FROM tv
        |  UNION ALL
        |  SELECT '2_click_after_view', count(*) FROM tc
        |  UNION ALL
        |  SELECT '3_purchase_after_click', count(*) FROM tp)
        |ORDER BY stage""".stripMargin,

    "q63_range_join_bucket" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id,
        |       date_diff('microsecond', a.ts, b.ts) AS delta_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
        |ORDER BY a_id, b_id""".stripMargin,

    "q61_asof_join" ->
      """WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
        |views AS (SELECT * FROM events WHERE event_type = 'view')
        |SELECT c.event_id AS click_id, c.user_id,
        |       COALESCE(v.event_id, -1) AS view_id,
        |       COALESCE(date_diff('microsecond', v.ts, c.ts), -1) AS gap_us
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND v.ts <= c.ts
        |ORDER BY click_id""".stripMargin,

    // q84: identical semantics to q61, exercised through the native
    // operator — the oracle is deliberately the same ASOF SQL
    "q84_asof_native" ->
      """WITH clicks AS (SELECT * FROM events WHERE event_type = 'click'),
        |views AS (SELECT * FROM events WHERE event_type = 'view')
        |SELECT c.event_id AS click_id, c.user_id,
        |       COALESCE(v.event_id, -1) AS view_id,
        |       COALESCE(date_diff('microsecond', v.ts, c.ts), -1) AS gap_us
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND v.ts <= c.ts
        |ORDER BY click_id""".stripMargin,

    "q44_sliding_window" ->
      """WITH b AS (
        |  SELECT event_type, value,
        |         time_bucket(INTERVAL 5 MINUTE, ts) AS bkt
        |  FROM events),
        |w AS (
        |  SELECT event_type, value, unnest([bkt, bkt - INTERVAL 5 MINUTE]) AS ws
        |  FROM b)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM w
        |GROUP BY ws, event_type
        |ORDER BY w_start, event_type""".stripMargin
  )
}
