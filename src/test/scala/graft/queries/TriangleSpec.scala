package graft.queries

import graft.SparkSpec

/** q197 triangle enumeration re-derived from first principles: a
  * textbook triple loop over the (independently hash-green) q27 edge
  * set must produce exactly the query's triangles — the degree
  * orientation and wedge closing are HOW; the triple loop is WHAT.
  */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  test("q197 equals the textbook triple loop over the q27 edge set") {
    val edges = graft.SparkEntry.queries("q27_minhash_neardup")(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val expected = (for {
      Seq(a, b, c) <- nodes.combinations(3)
      if edges((a, b)) && edges((b, c)) && edges((a, c))
    } yield (a, b, c)).toSet

    val rows = DedupQueries.dupTriangles(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(rows.toSet == expected,
      "q197 must enumerate exactly the textbook triangles")
    assert(rows.length == expected.size, "each triangle exactly once")
    assert(rows.nonEmpty, "witness: the dup graph must close a triangle")
  }
}
