package graft.queries

import graft.SparkSpec

/** q73 dedup-cluster resolution: the distributed min-label propagation
  * must agree exactly with a driver-side union-find over the same q27
  * near-dup pairs (ground truth for connected components).
  */
class DedupClustersSpec extends SparkSpec {

  test("q73 labels equal union-find components over the q27 pair graph") {
    val pairs = DedupQueries.minhashNearDup(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "sf0.001 should produce at least one near-dup pair")

    // union-find with min-id representative
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    pairs.foreach { case (a, b) => union(a, b) }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(id => id -> find(id)).toMap

    val got = DedupQueries.dedupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // representative property: every cluster label is its own label
    got.values.foreach(c => assert(got(c) == c))

    // the distributed label-propagation path (taken above the 1M-edge
    // gate) must produce the identical labeling
    import org.apache.spark.sql.functions.col
    val pairsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(pairs.toSeq.map(p => (p._1, p._2)), 4))
      .toDF("doc_a", "doc_b")
    val sym = pairsDf.unionByName(
      pairsDf.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst")
    val viaProp = DedupQueries.labelPropagate(sym).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaProp == expected)
  }
}
