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

    // q200: degree + per-node support + milli coefficient by hand
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val support = expected.toSeq.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expCc = deg.map { case (id, d) =>
      val t = support.getOrElse(id, 0L)
      id -> ((d, t, if (d >= 2) t * 2000 / (d * (d - 1)) else 0L))
    }
    val cc = DedupQueries.dupClusteringCoeff(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(cc == expCc,
      "q200 must equal the hand-computed clustering coefficients")
    assert(cc.values.exists(_._3 > 0), "witness: a clique member exists")
  }
}
