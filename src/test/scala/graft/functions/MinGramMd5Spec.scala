package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** The native min-gram fingerprint must equal the composed
  * min(md5(substring)) fold it replaced — including on multibyte text,
  * which the ASCII corpus (and therefore the DuckDB oracle) never
  * exercises: grams are CHARACTER windows, so the byte-offset walk
  * must respect UTF-8 boundaries. */
class MinGramMd5Spec extends graft.SparkSpec {
  import spark.implicits._

  private def brute(text: String, n: Int): Option[String] =
    if (text.codePointCount(0, text.length) < n) None
    else {
      // code-point-aware sliding window? No — Spark's substring()
      // counts UTF-16 chars like String.substring; UTF8String.numChars
      // counts Unicode code points. Match UTF8String semantics: one
      // "char" per code point.
      val cps = text.codePoints().toArray
      val grams = (0 to cps.length - n).map { i =>
        val g = new String(cps, i, n)
        java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8"))
          .map(b => f"${b & 0xFF}%02x").mkString
      }
      Some(grams.min)
    }

  test("equals the brute min(md5(gram)) on ASCII, multibyte, and edges") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "abcdefgh",            // exactly one gram
      "abcdefg",             // too short -> null
      "",                    // empty -> null
      "héllo wörld — naïve über garçon ñandú",  // 2-byte UTF-8
      "日本語のテキストで八文字以上の長さ",        // 3-byte UTF-8
      "aaaaaaaaaaaaaaaa",    // all grams identical
      "z" * 7 + "a" * 8)     // min gram at the end
    texts.foreach { t =>
      val got = Option(MinGramMd5.minGram(UTF8String.fromString(t), 8))
        .map(_.toString)
      assert(got == brute(t, 8), s"mismatch for ${t.take(20)}...")
    }
  }

  test("SQL surface matches the exploded md5 fold on real documents") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(org.apache.spark.sql.functions.length($"text") >= 8)
    val native = df.selectExpr("doc_id", "graft_min_gram_md5(text, 8) AS fp")
      .as[(Long, String)].collect().toMap
    val composed = df
      .selectExpr("doc_id", "explode(sequence(1, length(text) - 7)) AS i",
        "text")
      .selectExpr("doc_id", "md5(substring(text, i, 8)) AS g")
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.min($"g").as("fp"))
      .as[(Long, String)].collect().toMap
    assert(native == composed, "native fingerprint diverges from the fold")
  }
}
