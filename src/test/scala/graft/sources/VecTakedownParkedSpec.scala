package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.{ArtifactStore, SparkSpec}
import graft.llm.ServeBooks

/** Erasure across PARKED generations (r12 ADVICE, medium): the
  * delta-generational scheme makes multi-fp histories the common case —
  * an append moves the corpus fingerprint, parking the prior codes and
  * serve-cells generations at the old fp with every vector's encoded
  * geometry / raw values still on disk. A takedown that scoped its
  * sweep to the CURRENT corpus fingerprint would leave the victims
  * there forever; the content-scoped enumerator
  * ([[graft.llm.ServeBooks.generationsContaining]]) must find and
  * erase them in every generation that holds them.
  */
class VecTakedownParkedSpec extends SparkSpec {
  import spark.implicits._

  test("flag after an append erases the victim from generations parked " +
    "at the pre-append fp: codes invalidated, cells scrubbed in place") {
    val tmp = Files.createTempDirectory("vec_parked").toString
    // perturbed ONCE, shared by both corpus versions: A and B hold the
    // identical vector bytes per id (the same deployment appending), so
    // the (vec_id, digest)-scoped erasure matches both — while the MAIN
    // corpus's same numeric ids carry different bytes and its
    // generations must survive this spec's takedown. Salted per run so
    // a failed prior run's persisted tombstones/generations (same
    // fp-keyed store) cannot shadow this one's.
    val salt = ((new scala.util.Random).nextInt(4000) + 5000) / 1000.0f
    val full = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("embedding",
        transform(col("embedding"), x => (x + lit(salt)).cast("float")))
    val dirA = s"$tmp/a"; val dirB = s"$tmp/b"
    full.where(col("vec_id") < 300).write.parquet(s"$dirA/embeddings.parquet")
    full.where(col("vec_id") < 350).write.parquet(s"$dirB/embeddings.parquet")
    try {
      // deployment at corpus version A: serve cells + residual-PQ codes
      val bookA = ServeBooks.coarse(spark, dirA)
      val resA = ServeBooks.pqRes(spark, dirA)
      val cellsPathA = ServeBooks.annCellsPath(spark, dirA)
      ServeBooks.pqResCodesFor(spark, dirA, bookA, resA)
      val codesFpA = ServeBooks.pqResCodesFp(spark, dirA, bookA, resA)

      // the corpus appends 50 vectors; the deployment keeps its books
      // (the refresh policy's Extended posture) and publishes the new
      // corpus's generations — version A's stay PARKED at the old fp
      val cellsPathB = ServeBooks.annCellsPathFor(spark, dirB, bookA)
      ServeBooks.pqResCodesFor(spark, dirB, bookA, resA)
      val codesFpB = ServeBooks.pqResCodesFp(spark, dirB, bookA, resA)
      assert(cellsPathB != cellsPathA && codesFpB != codesFpA,
        "the append must publish new generations, parking version A's")

      val victim = 7L // present in BOTH corpus versions
      def cellsHold(path: String): Boolean =
        spark.read.parquet(path).where(col("vec_id") === victim)
          .limit(1).collect().nonEmpty
      assert(cellsHold(cellsPathA) && cellsHold(cellsPathB),
        "witness: the victim's raw vector sits in both cells generations")
      def codesDir(fp: Long) =
        Paths.get(ArtifactStore.root, ServeBooks.PqResCodesKey, s"fp-$fp")
      assert(Files.exists(codesDir(codesFpA)) && Files.exists(codesDir(codesFpB)))

      assert(VecTakedown.flag(spark, dirB, Seq(victim)) == 1L)

      // codes: BOTH generations invalidated — the parked one included
      assert(!Files.exists(codesDir(codesFpA)),
        "the parked codes generation kept the victim's encoded geometry")
      assert(!Files.exists(codesDir(codesFpB)))

      // cells: BOTH generations scrubbed IN PLACE (still published — a
      // live stream may pin either), the victim's rows and certificate
      // entries gone, the rest intact
      Seq(cellsPathA, cellsPathB).foreach { p =>
        assert(Files.exists(Paths.get(p).getParent.resolve("manifest.json")),
          s"scrub must keep the generation published: $p")
        assert(!cellsHold(p), s"victim rows must be scrubbed from $p")
        val cert = spark.read.parquet(s"${Paths.get(p).getParent}/vecs")
          .select("vec_id").as[Long].collect().toSet
        assert(!cert.contains(victim),
          s"the carry certificate must forget the victim: $p")
        assert(cert.nonEmpty, s"unflagged certificate entries survive: $p")
      }
      assert(spark.read.parquet(cellsPathA).count() == 299L,
        "exactly the victim's row leaves version A's generation")
    } finally {
      VecTakedown.reset(spark, dirB)
      // drop this spec's generations entirely: the fixture corpora share
      // the main corpus's vec_id space, and a leaked generation would
      // trip other specs' cross-generation sweeps
      Seq(dirA, dirB).foreach { d =>
        ServeBooks.annCellsFpsFor(spark, d).foreach(
          ArtifactStore.invalidate(ServeBooks.AnnCellsKey, _))
        ServeBooks.pqResCodesFpsFor(spark, d).foreach(
          ArtifactStore.invalidate(ServeBooks.PqResCodesKey, _))
      }
    }
  }
}
