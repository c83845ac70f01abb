package graft.queries

import graft.SparkSpec

/** Independent evidence for the operational queries: q110's digests
  * recomputed from raw parquet in plain Scala (plus the
  * mutation-detection property a checksum exists for) and q111's
  * profile against brute counts.
  */
class OpsSpec extends SparkSpec {

  /** The engine-wide 60-bit md5 idiom, recomputed independently. */
  private def h60(tag: String, v: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest((tag + "|" + v).getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map("%02x".format(_)).mkString.take(15), 16)
  }

  private val CkMod = BigInt("2305843009213693951")

  test("q110: digests equal a Scala recomputation; one-char flips are detected") {
    val res = OpsQueries.tableChecksum(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => Seq(r.getLong(0).toString, r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4).toString).mkString("|"))
    def digest(keys: Seq[String], tag: String): (Long, Long, Long) = {
      val hs = keys.map(k => h60(tag, k))
      ((keys.size.toLong,
        (hs.map(BigInt(_)).sum mod CkMod).toLong,
        hs.reduce(_ ^ _)))
    }
    assert(res("documents") == digest(docs.toSeq, "ck|documents"))
    // detection: mutate one character of one row → both digests move
    val mutated = docs.toSeq.updated(0, docs(0).dropRight(1) + "X")
    val (_, mSum, mXor) = digest(mutated, "ck|documents")
    assert(mSum != res("documents")._2 && mXor != res("documents")._3)
    // order independence: the digest of a shuffled copy is identical
    val shuffled = new scala.util.Random(11).shuffle(docs.toSeq)
    assert(digest(shuffled, "ck|documents") == res("documents"))
    assert(res.keySet == Set("documents", "orders", "lineitem"))
  }

  test("q111: profile equals brute counts; sketch degenerates to exact under k") {
    val res = OpsQueries.columnProfile(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6)))).toMap
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type", "user_id",
        "CAST(CAST(value AS DECIMAL(18,2)) AS STRING) AS value", "props")
      .collect()
    def brute(i: Int): (Long, Long, Long) = {
      val vs = ev.map(r => if (r.isNullAt(i)) null else r.get(i).toString)
      (vs.length.toLong, vs.count(_ == null).toLong,
        vs.filter(_ != null).distinct.length.toLong)
    }
    for ((name, i) <- Seq("event_type" -> 0, "user_id" -> 1,
      "value" -> 2, "props" -> 3)) {
      val (n, nNull, kUsed, est, truth, relErr) = res(name)
      val (bn, bNull, bDistinct) = brute(i)
      assert(n == bn && nNull == bNull, s"$name counts")
      assert(truth == bDistinct, s"$name truth")
      if (kUsed < 64) {
        assert(est == truth.toDouble && relErr == 0.0,
          s"$name must be exact when distinct < k")
      } else assert(math.abs(relErr) < 0.6, s"$name rel_err $relErr")
    }
  }
}
