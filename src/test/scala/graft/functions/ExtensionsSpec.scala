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

  test("graft_bpe_tbl applies the plan-literal merge table from SQL") {
    // table: e+r, s+t, st+er — 'stern' folds s t e r n → st er n → ster n
    val r = spark.sql(
      "SELECT graft_bpe_tbl('stern', 'e r\ns t\nst er') AS p")
      .head().getString(0)
    assert(r == "ster n", s"got '$r'")
  }

  test("graft_pq_decode reconstructs coarse(cell) + book(m)(code) exactly") {
    // tiny geometry: 2 cells × dim 4, 2 subspaces × 2 codewords × 2 dims
    val coarse = Array(Array(1.0, 2.0, 3.0, 4.0), Array(10.0, 20.0, 30.0, 40.0))
    val books = Array(
      Array(Array(0.5, 0.25), Array(-0.5, -0.25)),
      Array(Array(0.125, 0.0625), Array(-0.125, -0.0625)))
    val spec = PqDecodeTable.toSpec(coarse, books)
    // spec round-trips bit-exactly (doubleToLongBits hex)
    val dec = PqDecodeTable.parseSpec(spec)
    assert(dec.coarse.map(_.toSeq).toSeq == coarse.map(_.toSeq).toSeq)
    val r = spark.sql(
      s"SELECT graft_pq_decode(1L, array(0L, 1L), '$spec') AS x")
      .head().getSeq[Double](0)
    assert(r == Seq(10.5, 20.25, 30.0 - 0.125, 40.0 - 0.0625), s"got $r")
  }

  test("graft_int8_decode dequantizes to bucket centers, degenerate dim to mn") {
    val mns = Array(0.0, -1.0, 5.0)
    val mxs = Array(255.0, 1.0, 5.0) // dim 2 degenerate (mx = mn)
    val spec = Int8DecodeTable.toSpec(mns, mxs)
    val r = spark.sql(
      s"SELECT graft_int8_decode(array(0L, 255L, 7L), '$spec') AS x")
      .head().getSeq[Double](0)
    assert(r == Seq(0.5, -1.0 + (255.5 * 2.0) / 255.0, 5.0), s"got $r")
  }

  test("graft_h60 is bit-identical to the SQL md5 chain it replaces") {
    import org.apache.spark.sql.functions._
    // corpus tokens + adversarial cases: empty, unicode, separators,
    // long strings, digest edge patterns
    val edge = Seq("", "a", "mix|0", "kmv|42", "é-ü-中文", "x" * 10000,
      "a|b|c", " leading", "trailing ", "\ttab")
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .limit(2000).collect().map(_.getString(0)).toSeq
    import spark.implicits._
    val df = (edge ++ corpus).toDF("s")
    val bad = df.select(
      call_function("graft_h60", col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("chain"))
      .where(col("native") =!= col("chain")).count()
    assert(bad == 0L)
    // null propagates; codegen path active (no interpreted fallback)
    assert(spark.sql("SELECT graft_h60(CAST(NULL AS STRING)) AS h")
      .head().isNullAt(0))
    // codegen path active on a real scan (a local relation folds to
    // LocalTableScan and proves nothing)
    val plan = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(call_function("graft_h60", col("text")))
      .queryExecution.executedPlan.toString
    // the `*(n)` stage marker = the projection compiled into whole-stage
    // codegen; a CodegenFallback expression would print a bare Project
    assert("\\*\\(\\d+\\) Project \\[graft_h60".r.findFirstIn(plan).isDefined,
      plan.take(400))
  }

  test("graft_pq_decode rejects a spec whose arrays contradict the geometry") {
    // head declares 2 cells x (2x2) dims but the coarse book carries 3
    // cells' worth of values — must error, not silently mis-slice
    val good = PqDecodeTable.toSpec(
      Array(Array(1.0, 2.0, 3.0, 4.0), Array(5.0, 6.0, 7.0, 8.0)),
      Array(Array(Array(0.0, 0.0), Array(1.0, 1.0)),
        Array(Array(0.0, 0.0), Array(1.0, 1.0))))
    val Array(head, cbits, bbits) = good.split(";", 3)
    val widened = head + ";" + cbits + ",3ff0000000000000,3ff0000000000000," +
      "3ff0000000000000,3ff0000000000000;" + bbits
    val e = intercept[IllegalArgumentException](
      PqDecodeTable.parseSpec(widened))
    assert(e.getMessage.contains("coarse book"), e.getMessage)
    val f = intercept[IllegalArgumentException](
      PqDecodeTable.parseSpec(head + ";" + cbits + ";" +
        bbits + ",3ff0000000000000"))
    assert(f.getMessage.contains("fine books"), f.getMessage)
  }

  test("graft_int8_decode rejects codes outside [0, 255]") {
    val spec = Int8DecodeTable.toSpec(Array(0.0, 0.0), Array(1.0, 1.0))
    val e = intercept[Exception](spark.sql(
      s"SELECT graft_int8_decode(array(0L, 256L), '$spec') AS x").collect())
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg.contains("outside [0, 255]"), msg)
  }

  test("graft_dot rejects non-array arguments at analysis time") {
    val e = intercept[Exception](spark.sql("SELECT graft_dot(1, 2)").collect())
    assert(e.getMessage.contains("graft_dot") || e.getMessage.contains("DATATYPE"))
  }
}
