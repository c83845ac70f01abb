package graft.sources

import graft.SparkSpec

/** S2–S4 semantics: JSON-envelope decode and the limit-2 comma split
  * (`x.split(',', 1)` in the reference — commas inside the text survive).
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("envelope decode flattens the JSON array and splits at the FIRST comma") {
    val lines = Seq(
      """["4,hello, world, with commas","0,plain"]""",
      """["4,trailing,comma,"]""").toDF("value")
    val out = Ingest.decodeEnvelope(lines)
      .as[(String, String)].collect().toSet
    assert(out == Set(
      ("4", "hello, world, with commas"),
      ("0", "plain"),
      ("4", "trailing,comma,")))
  }

  test("records without a comma yield a null Tweet (dropped later by F1)") {
    val lines = Seq("""["nocomma"]""").toDF("value")
    val out = Ingest.decodeEnvelope(lines).collect().head
    assert(out.getString(0) == "nocomma" && out.isNullAt(1))
  }

  test("malformed JSON lines decode to no records (from_json null-safe)") {
    val lines = Seq("""not json at all""").toDF("value")
    assert(Ingest.decodeEnvelope(lines).count() == 0)
  }

  test("explicit record schema is fixed, never inferred") {
    assert(Ingest.RecordSchema.fieldNames.toSeq == Seq("Label", "Tweet"))
  }
}
