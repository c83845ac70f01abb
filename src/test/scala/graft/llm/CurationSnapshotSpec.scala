package graft.llm

import graft.SparkSpec

/** The re-freeze loop closed (r8 verdict item 4): the pinned curation
  * snapshot is managed state with a CODED drift policy, q159's gauge
  * reads it, and a forced re-freeze swaps every pinned consumer
  * (q77/q101/q102, q159's ref side) to the new book in lockstep with
  * the parquet their DuckDB oracles read — which is the structural
  * reason the oracles stay green on BOTH sides of the switch.
  */
class CurationSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def q77Cells(): Map[Long, Long] =
    graft.SparkEntry.queries("q77_semantic_sample")(spark, sfDir)
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap

  private def driftTotal(): Long =
    graft.SparkEntry.queries("q159_codebook_drift")(spark, sfDir)
      .select("drift_scaled").as[Long].collect().sum

  test("first touch pins the historical book; policy holds below threshold; " +
      "forced re-freeze swaps pin, gauge, and consumers together") {
    val original = CurationSnapshot.centroids(spark, sfDir).map(_.clone())
    try {
      // first touch == the historical IvfCodebook pin, bit-exact
      assert(original.length == IvfCodebook.Cells)
      for (k <- original.indices)
        assert(original(k).toSeq == IvfCodebook.centroids(k).toSeq,
          s"seeded snapshot cell $k must equal the historical pin")

      val drift0 = CurationSnapshot.driftRms(spark, sfDir)
      assert(drift0 > 0.0,
        "witness: trained book differs from the pin, else the policy is vacuous")

      // below threshold: verdict stability wins, nothing moves
      assert(!CurationSnapshot.refreezeIfDrifted(spark, sfDir,
        threshold = drift0 * 2))
      assert(CurationSnapshot.centroids(spark, sfDir).map(_.toSeq).toSeq ==
        original.map(_.toSeq).toSeq)

      val cellsBefore = q77Cells()

      // above threshold: the pin republishes FROM the trained book
      assert(CurationSnapshot.refreezeIfDrifted(spark, sfDir,
        threshold = drift0 / 2))
      val trained = ServeBooks.coarse(spark, sfDir)
      assert(CurationSnapshot.centroids(spark, sfDir).map(_.toSeq).toSeq ==
        trained.map(_.toSeq).toSeq,
        "re-frozen snapshot must be the trained book, bit-exact")
      // the gauge now reads zero: q159 measures snapshot-vs-trained
      assert(CurationSnapshot.driftRms(spark, sfDir) == 0.0)
      assert(driftTotal() == 0L,
        "q159 must read 0 drift immediately after a re-freeze")

      // consumers follow the pin: q77 re-clusters under the new book
      // (same corpus, different geometry — cells may move; the query
      // keeps serving and reads the SAME parquet its oracle reads)
      val cellsAfter = q77Cells()
      assert(cellsAfter.nonEmpty)
      assert(cellsBefore != cellsAfter || trained.map(_.toSeq).toSeq ==
        original.map(_.toSeq).toSeq,
        "a moved pin must move the clustering (unless books were equal)")
    } finally {
      // restore the historical pin for cross-round determinism
      CurationSnapshot.repin(spark, sfDir, original)
    }
    assert(CurationSnapshot.centroids(spark, sfDir).map(_.toSeq).toSeq ==
      original.map(_.toSeq).toSeq)
  }
}
