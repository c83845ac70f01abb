package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** SURVEY §5.4 property tests for the cleaning chain: on ANY input the
  * output is lowercase letters in single-space runs (trimmed), and the
  * chain is idempotent on its own output.
  */
class CleanPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomStrings(n: Int): Seq[String] = {
    val rnd = new scala.util.Random(1234)
    val alphabet =
      "abcXYZ 019!@#&:/.\t\né中文😀摘要 http://x.co/a @user #tag"
    (1 to n).map { _ =>
      val len = rnd.nextInt(60)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } :+ "" :+ "   " :+ "@only #tags &here" :+ "http://only.url/path"
  }

  test("output is always trimmed single-spaced lowercase letters") {
    val out = randomStrings(300).toDF("s")
      .select(Clean.clean(col("s")).as("c")).as[String].collect()
    val ok = "^$|^[a-z]+( [a-z]+)*$".r
    out.foreach(c => assert(ok.matches(c), s"bad clean output: '$c'"))
  }

  test("cleaning is idempotent on its own output") {
    val df = randomStrings(300).toDF("s")
      .select(Clean.clean(col("s")).as("once"))
      .select(col("once"), Clean.clean(col("once")).as("twice"))
      .as[(String, String)].collect()
    df.foreach { case (once, twice) => assert(once == twice) }
  }
}
