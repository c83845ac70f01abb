package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables
  * (`/root/testdata/sf*`, schemas in FIXTURES.md §B).
  *
  * Every query takes an `sfDir` so the same plan runs at any scale factor.
  * Scans are plain parquet reads — Catalyst pushes filters/projections down
  * to the scan (verify with `.explain("formatted")`: `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped as two physical types across testdata
    * generations; both normalize to session-TZ TIMESTAMP here so every
    * query downstream sees one type:
    *
    *  - parquet TIMESTAMP(NANOS), which Spark's reader rejects unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set in every session
    *    builder here). The column arrives as nano-epoch `long`; truncate
    *    to micros — the same truncation DuckDB applies reading
    *    TIMESTAMP_NS as TIMESTAMP.
    *  - parquet timestamp[us] without timezone metadata, which Spark
    *    reads as TIMESTAMP_NTZ. The session timezone is pinned to UTC in
    *    every builder, so the NTZ→TZ cast reinterprets the same wall
    *    clock at identical micros — exactly DuckDB's TIMESTAMP read.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      // `div` keeps the truncation in exact integer space; `/ 1000L` would
      // round-trip through double, whose ULP at nano-epoch magnitude
      // (~1.7e18) is ~256 ns — off-by-one micros vs DuckDB's exact
      // TIMESTAMP_NS truncation for finely-grained timestamps.
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
