package graft.functions

import org.apache.spark.sql.functions._

/** The native row-local simhash must be bit-equal to the aggregation
  * plan it replaced (explode → per-token counts → 48 signed hex-digit
  * sums) — on real documents and on whitespace/empty edge cases. */
class SimHash48Spec extends graft.SparkSpec {
  import spark.implicits._

  /** The pre-native aggregation form, verbatim (the DuckDB oracle's
    * shape) — kept here as the differential reference. */
  private def aggForm(docs: org.apache.spark.sql.DataFrame) = {
    val tokCnt = docs
      .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("t"))
      .where(col("t") =!= "")
      .groupBy("doc_id", "t").agg(count(lit(1)).as("cnt"))
    val hexWithBit = Map(8 -> "89abcdef", 4 -> "4567cdef",
      2 -> "2367abef", 1 -> "13579bdf")
    val withDigits = tokCnt.withColumn("m", md5(col("t")))
      .select(col("doc_id") +: col("cnt") +:
        (1 to 12).map(p => substring(col("m"), p, 1).as(s"d$p")): _*)
    val sums = (0 until 48).map { b =>
      val hit = col(s"d${b / 4 + 1}")
        .isin(hexWithBit(8 >> (b % 4)).map(_.toString): _*)
      sum(when(hit, col("cnt")).otherwise(-col("cnt"))).as(s"s$b")
    }
    val fp = (0 until 48)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L))
      .reduce(_ + _)
    withDigits.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
  }

  test("native simhash == aggregation form on real documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val native = graft.llm.Dedup.simhash(docs)
      .as[(Long, Long)].collect().toMap
    val agg = aggForm(docs).as[(Long, Long)].collect().toMap
    assert(agg.nonEmpty && native == agg,
      "native simhash diverges from the aggregation plan")
  }

  test("edge cases: empty/whitespace-only null; repeats weight; ties negative") {
    val docs = Seq(
      (1L, ""), (2L, "   "), (3L, "\t\n"),
      (4L, "one"), (5L, "one one one"),
      (6L, "  leading and trailing  "),
      (7L, "a b a b")).toDF("doc_id", "text")
    val native = graft.llm.Dedup.simhash(docs)
      .as[(Long, Long)].collect().toMap
    val agg = aggForm(docs).as[(Long, Long)].collect().toMap
    assert(native == agg, s"edge-case divergence: $native vs $agg")
    assert(!native.contains(1L) && !native.contains(2L) && !native.contains(3L),
      "token-free docs must be absent, as the aggregation form leaves them")
  }
}
