package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Sink surface: a query result round-trips through parquet, CSV (with
  * header + explicit read schema), and JSON without value drift.
  */
class SinkSpec extends SparkSpec {

  private lazy val result = RelationalQueries.aggSummary(spark, sfDir)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("l_returnflag", "l_linestatus").collect().map(_.toString).toSeq

  test("parquet round-trip preserves schema and values") {
    val dir = Files.createTempDirectory("sink-parquet").toString + "/out"
    result.write.parquet(dir)
    val back = spark.read.parquet(dir)
    // parquet widens non-null to nullable on read; names+types must hold
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      result.schema.map(f => (f.name, f.dataType)))
    assert(rows(back) == rows(result))
  }

  test("csv round-trip with declared schema preserves values") {
    val dir = Files.createTempDirectory("sink-csv").toString + "/out"
    result.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(result.schema).csv(dir)
    assert(rows(back) == rows(result))
  }

  test("json round-trip with declared schema preserves values") {
    val dir = Files.createTempDirectory("sink-json").toString + "/out"
    result.write.json(dir)
    val back = spark.read.schema(result.schema).json(dir)
    assert(rows(back) == rows(result))
  }
}
