package graft.queries

import graft.SparkSpec
import graft.text.{Clean, Tokenize}
import org.apache.spark.sql.functions._

/** q38's stem-after-count restructuring must equal the per-occurrence
  * form: cnt(stem) is a sum over the stem's token preimage, so the two
  * plans are the same function — proven here on real documents. */
class StemCountSpec extends SparkSpec {
  import spark.implicits._

  test("q38 == per-occurrence stemming on real documents") {
    val got = graft.SparkEntry.queries("q38_stem_tokens")(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    val perOccurrence = graft.Tables.documents(spark, sfDir)
      .select(explode(
        Tokenize.stemTokens(
          Tokenize.removeStopWords(
            Tokenize.tokenize(Clean.clean(col("text")))))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .as[(String, Long)].collect().toSeq
    assert(got.nonEmpty && got == perOccurrence,
      "stem-after-count diverged from stem-per-occurrence")
  }
}
