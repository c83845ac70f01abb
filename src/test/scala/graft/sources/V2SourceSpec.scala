package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The custom DataSource V2 connector: correctness of the generated
  * relation, and PROOF the planner consumed the pushdown — range
  * predicates shrink the planned partition count, and pruned columns
  * leave the scan schema. */
class V2SourceSpec extends SparkSpec {
  import spark.implicits._

  private val Fmt = "graft.sources.v2.RangeDocsProvider"

  private def read(rows: Int = 1000, parts: Int = 10) =
    spark.read.format(Fmt)
      .option("numRows", rows.toString)
      .option("numPartitions", parts.toString)
      .load()

  test("full scan generates the declared relation") {
    val df = read()
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 10)
    val row = df.where(col("id") === 5).collect().head
    assert(row.getAs[Long]("bucket") == 5L && row.getAs[String]("text") == "doc-5")
  }

  test("range pushdown shrinks the planned partitions, not just the rows") {
    val df = read().where(col("id") >= 900)
    assert(df.count() == 100)
    // the pushed range is visible in the scan description
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("lo=900"), plan.take(1500))
    // [900, 1000) spans a single 100-row split of the pushed-down range
    assert(df.rdd.getNumPartitions == 1,
      s"pushdown must narrow the span before planning, got ${df.rdd.getNumPartitions}")
  }

  test("two-sided range and equality push down exactly") {
    val mid = read().where(col("id") >= 400 && col("id") < 600)
    assert(mid.count() == 200 && mid.rdd.getNumPartitions <= 2)
    val one = read().where(col("id") === 123)
    assert(one.count() == 1 && one.rdd.getNumPartitions == 1)
  }

  test("non-id predicates stay as post-scan filters and still apply") {
    val df = read().where(col("bucket") === 0L)
    // 1000 rows, bucket = id % 97 → ids 0, 97, ..., 970
    assert(df.count() == 11)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), "bucket predicate must remain post-scan")
  }

  test("micro-batch streaming face drains the table in offset-bounded batches") {
    val q = spark.readStream.format(Fmt)
      .option("numRows", "250")
      .option("rowsPerBatch", "100")
      .load()
      .writeStream.format("memory").queryName("v2_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("v2_stream").count() == 250)
      val ids = spark.table("v2_stream").select("id").as[Long].collect().toSet
      assert(ids == (0L until 250L).toSet)
      // admission control: 250 rows at 100/trigger → at least 3 batches
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 3, s"expected rate-limited batches, saw $batches")
    } finally q.stop()
  }

  test("column pruning reaches the reader schema") {
    val df = read().select(col("id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=id]"),
      s"expected the scan to read only id, plan: ${plan.take(600)}")
  }
}
