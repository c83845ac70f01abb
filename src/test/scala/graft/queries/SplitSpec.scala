package graft.queries

import graft.SparkSpec

/** q138/q139: the frozen split manifest and its leakage audit equal
  * independent driver-side recomputations (md5 hash arithmetic redone
  * with MessageDigest, shingles re-derived from raw text). */
class SplitSpec extends SparkSpec {

  /** The engine's 60-bit md5 idiom, recomputed independently. */
  private def h60(v: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  private def bucket(docId: Long): Long = h60(s"split|$docId") % 10

  private def splitOf(docId: Long): String = {
    val b = bucket(docId)
    if (b < 8) "train" else if (b == 8) "val" else "test"
  }

  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

  test("q138: manifest equals brute hash-split counting; all splits occupied") {
    val exp = docs.groupBy(d => (d._3, d._4, splitOf(d._1))).view
      .mapValues(ds => (ds.length.toLong, ds.map(_._5).sum)).toMap
    val got = DedupQueries.splitManifest(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(got == exp, "manifest differs from brute")
    // the 80/10/10 hash split actually lands all three splits globally
    val bySplit = docs.groupBy(d => splitOf(d._1)).view.mapValues(_.length).toMap
    assert(Set("train", "val", "test").subsetOf(bySplit.keySet))
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"),
      s"train must dominate an 80/10/10 split: $bySplit")
  }

  test("q139: leakage counts equal a brute gram-mask recomputation") {
    val masks = scala.collection.mutable.Map.empty[String, Int]
    val testDocGrams = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[String]]
    docs.foreach { case (id, text, _, _, _) =>
      val w = text.trim.split("\\s+")
      val grams = if (w.length >= 8) w.sliding(8).map(_.mkString(" ")).toSet
        else Set.empty[String]
      val bit = splitOf(id) match {
        case "train" => 1; case "val" => 2; case _ => 4 }
      grams.foreach { g => masks(g) = masks.getOrElse(g, 0) | bit }
      if (bit == 4) testDocGrams(id) = scala.collection.mutable.Set(grams.toSeq: _*)
    }
    val nGrams = masks.size.toLong
    def pair(m: Int) = masks.values.count(v => (v & m) == m).toLong
    val leaky = testDocGrams.count { case (_, gs) =>
      gs.exists(g => (masks(g) & 1) == 1) }.toLong
    val r = DedupQueries.splitLeakage(spark, sfDir).collect().head
    assert(r.getLong(0) == nGrams, "n_grams")
    assert(r.getLong(1) == pair(3), "n_train_val")
    assert(r.getLong(2) == pair(5), "n_train_test")
    assert(r.getLong(3) == pair(6), "n_val_test")
    assert(r.getLong(4) == leaky, "n_leaky_test_docs")
    assert(nGrams > 0)
  }
}
