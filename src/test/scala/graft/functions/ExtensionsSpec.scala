package graft.functions

import graft.SparkSpec

/** The engine's native expressions are registered through
  * SparkSessionExtensions, so they must work from plain SQL text too —
  * not just the Column API.
  */
class ExtensionsSpec extends SparkSpec {

  test("graft_dot is callable from SQL and folds left-to-right") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
  }

  test("graft_dot handles length mismatch by the shorter array") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(10.0D, 10.0D, 99.0D)) AS d")
      .head().getDouble(0)
    assert(r == 30.0)
  }

  test("graft_dot returns null on null input") {
    assert(spark.sql("SELECT graft_dot(NULL, array(1.0D)) AS d").head().isNullAt(0))
  }

  test("graft_stem is callable from SQL") {
    val r = spark.sql("SELECT graft_stem('running') AS s").head().getString(0)
    assert(r == "run")
  }

  test("graft_dot rejects non-array arguments at analysis time") {
    val e = intercept[Exception](spark.sql("SELECT graft_dot(1, 2)").collect())
    assert(e.getMessage.contains("graft_dot") || e.getMessage.contains("DATATYPE"))
  }
}
