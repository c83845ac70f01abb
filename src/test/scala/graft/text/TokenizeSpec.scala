package graft.text

import org.apache.spark.ml.feature.{StopWordsRemover, Tokenizer}
import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** The column-function formulations in Tokenize must agree with the
  * MLlib transformers they re-express (the reference's T1/T2 classes) —
  * on cleaned input they are drop-in equivalent, keeping the query path
  * codegen-friendly while Featurize keeps API parity.
  */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "the quick brown fox", "a a the the of", "spark streaming engine",
    "single", "is was were be been being", "x")

  test("tokenize matches MLlib Tokenizer on cleaned text") {
    val df = samples.toDF("Tweet")
    val mllib = new Tokenizer().setInputCol("Tweet").setOutputCol("t")
      .transform(df).select("t").as[Seq[String]].collect()
    val ours = df.select(Tokenize.tokenize(col("Tweet")).as("t"))
      .as[Seq[String]].collect()
    assert(mllib.toSeq == ours.toSeq)
  }

  test("removeStopWords matches MLlib StopWordsRemover (order and dupes kept)") {
    val df = samples.toDF("Tweet")
      .select(Tokenize.tokenize(col("Tweet")).as("toks"))
    val mllib = new StopWordsRemover().setInputCol("toks").setOutputCol("f")
      .transform(df).select("f").as[Seq[String]].collect()
    val ours = df.select(Tokenize.removeStopWords(col("toks")).as("f"))
      .as[Seq[String]].collect()
    assert(mllib.toSeq == ours.toSeq)
  }

  test("stop-word list is MLlib's own english list") {
    assert(Tokenize.stopWords == StopWordsRemover.loadDefaultStopWords("english").toSeq)
    assert(Tokenize.stopWords.contains("the") && Tokenize.stopWords.contains("ourselves"))
  }
}
