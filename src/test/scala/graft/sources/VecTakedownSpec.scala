package graft.sources

import java.nio.file.{Files, Paths}

import graft.{ArtifactStore, SparkSpec}
import graft.llm.ServeBooks

/** The embeddings-side takedown cascade (r8 verdict item 3): flagged
  * vectors vanish from every ANN serve query's top-K immediately, the
  * embeddings-fingerprinted model/state artifacts are invalidated and
  * rebuilt MINUS the tombstones, and a second pass is a no-op.
  */
class VecTakedownSpec extends SparkSpec {
  import spark.implicits._

  private val ServeQueries = Seq(
    "q55_knn_ivf", "q64_knn_ivfpq", "q113_knn_ivf_int8",
    "q164_knn_ivfpq_res")

  private def neighborsOf(name: String): Set[Long] =
    graft.SparkEntry.queries(name)(spark, sfDir)
      .select("neighbor_id").as[Long].collect().toSet

  private def manifestTimes(fp: Long): Map[String, Long] =
    VecTakedown.embArtifactKeys.flatMap { k =>
      val m = Paths.get(ArtifactStore.root, k, s"fp-$fp", "manifest.json")
      if (Files.exists(m)) Some(k -> Files.getLastModifiedTime(m).toMillis)
      else None
    }.toMap

  test("flag: vectors vanish from all four serve top-Ks, artifacts " +
      "invalidated and rebuilt minus tombstones, second pass no-op") {
    val fp = ArtifactStore.embeddingsFp(spark, sfDir)
    try {
      // baseline: pick victims actually SERVED by every arm, so the
      // vanish assertion is a real behavior change, not vacuous
      val baseline = ServeQueries.map(q => q -> neighborsOf(q)).toMap
      val common = baseline.values.reduce(_ intersect _)
      assert(common.nonEmpty, "witness: some neighbor serves in all arms")
      val victims = common.toSeq.sorted.take(3)

      val n = VecTakedown.flag(spark, sfDir, victims)
      assert(n == victims.size.toLong)
      assert(VecTakedown.flagged(spark, sfDir) == victims)

      // the six embeddings-fingerprinted families died with the flags
      VecTakedown.embArtifactKeys.foreach { k =>
        assert(!Files.exists(Paths.get(ArtifactStore.root, k, s"fp-$fp")),
          s"$k must be invalidated by the cascade")
      }

      // serve again: every arm retrains/re-encodes transparently and
      // no flagged vector appears in any top-K
      val after = ServeQueries.map(q => q -> neighborsOf(q)).toMap
      ServeQueries.foreach { q =>
        assert(after(q).intersect(victims.toSet).isEmpty,
          s"$q still serves flagged vectors")
        assert(after(q).nonEmpty, s"$q must keep serving unflagged corpus")
      }
      // the rebuilt code indexes carry no flagged rows (index-level
      // erasure, not just output filtering)
      val resCodes = ServeBooks.pqResCodes(spark, sfDir)
        .select("vec_id").as[Long].collect().toSet
      val i8Codes = ServeBooks.int8Codes(spark, sfDir)
        .select("vec_id").as[Long].collect().toSet
      assert(resCodes.intersect(victims.toSet).isEmpty)
      assert(i8Codes.intersect(victims.toSet).isEmpty)

      // second pass: nothing new flagged, nothing invalidated (the
      // just-rebuilt artifacts' manifests are untouched)
      val before2 = manifestTimes(fp)
      assert(before2.nonEmpty, "rebuilt artifacts must exist")
      assert(VecTakedown.flag(spark, sfDir, victims) == 0L)
      assert(manifestTimes(fp) == before2,
        "an idempotent re-run must not re-invalidate artifacts")
      assert(VecTakedown.flagged(spark, sfDir) == victims)
    } finally {
      // retract: sentinel-only tombstones, families rebuilt from the
      // full corpus by their next consumer
      VecTakedown.reset(spark, sfDir)
    }
    assert(VecTakedown.flagged(spark, sfDir).isEmpty)
  }
}
