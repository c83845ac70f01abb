package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.streaming.StreamContainment.Doc

/** Streaming containment (VERDICT r4 item 9): the defining case is a
  * quoted excerpt arriving batches after its source document — a
  * per-batch q96 re-run can't see it; shingle-bucket state can. Also
  * asserts the df cap actually stops hot-shingle emission and state
  * growth.
  */
class StreamContainmentSpec extends SparkSpec {
  import spark.implicits._

  // 20-token source; the excerpt is tokens 4..15 (12 tokens → 5 distinct
  // 8-grams, all present in the source → containment 1.0)
  private val source = ("alpha beta gamma delta epsilon zeta eta theta iota " +
    "kappa lambda mu nu xi omicron pi rho sigma tau upsilon")
  private val excerpt = source.split(" ").slice(4, 16).mkString(" ")
  private val noise1 =
    "one two three four five six seven eight nine ten eleven twelve thirteen"
  private val noise2 =
    "red orange yellow green blue indigo violet cyan magenta umber ochre teal"

  test("shingleSet matches the batch definition: distinct word-8-grams") {
    assert(StreamContainment.shingleSet(excerpt).length == 5)
    assert(StreamContainment.shingleSet("a b c").isEmpty)
    val rep = Array.fill(9)("x").mkString(" ")
    assert(StreamContainment.shingleSet(rep).length == 1) // distinct
  }

  test("excerpt arriving 3 batches after its source is caught at containment 1.0") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Doc]
      val query = StreamContainment
        .containments(stream.toDS(), threshold = 0.6, dfCap = 5)
        .writeStream.format("memory").queryName("stream_containment")
        .outputMode("update").start()
      try {
        stream.addData(Doc(1, source))
        query.processAllAvailable()
        stream.addData(Doc(2, noise1))
        query.processAllAvailable()
        stream.addData(Doc(3, noise2))
        query.processAllAvailable()
        stream.addData(Doc(4, excerpt)) // 3 batches after its source
        query.processAllAvailable()
        val rows = spark.table("stream_containment")
          .select("inner_doc", "outer_doc", "containment").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        assert(rows.toSet == Set((4L, 1L, 1.0)),
          s"expected exactly the cross-batch containment, saw ${rows.mkString(", ")}")
      } finally query.stop()
    }
  }

  test("hot shingle stops emitting and growing at the df cap") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val stream = MemoryStream[Doc]
      // every doc shares ONE 8-gram (the hot boilerplate); dfCap = 2, so
      // doc 12/13 must emit nothing even though the shingle matches
      val hot = "common header tokens repeated across documents every time"
      def doc(i: Long, tail: String) = Doc(i, s"$hot $tail")
      val query = StreamContainment
        .containments(stream.toDS(), threshold = 0.01, dfCap = 2)
        .writeStream.format("memory").queryName("stream_containment_cap")
        .outputMode("update").start()
      try {
        stream.addData(doc(11, "first unique suffix here"))
        query.processAllAvailable()
        stream.addData(doc(12, "second unique suffix there"))
        query.processAllAvailable()
        stream.addData(doc(13, "third unique suffix elsewhere"))
        query.processAllAvailable()
        val pairs = spark.table("stream_containment_cap")
          .select("inner_doc", "outer_doc").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        // 11↔12 met while the bucket was under the cap; 13 was dropped
        assert(pairs == Set((11L, 12L), (12L, 11L)),
          s"saw $pairs")
      } finally query.stop()
    }
  }
}
