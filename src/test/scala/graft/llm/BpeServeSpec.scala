package graft.llm

import graft.SparkSpec

/** The BPE serve loop (ServeBooks' closure applied to the tokenizer):
  * q99's output over the ArtifactStore-served merge table equals a
  * driver-side brute apply of a FRESHLY trained table (BpeTrain run
  * directly, bypassing the artifact) — published bytes, live training,
  * and the plan-literal expression all agree.
  */
class BpeServeSpec extends SparkSpec {

  test("q99 served from the trained artifact equals a brute apply of live training") {
    // independent arm: train NOW, apply driver-side
    val trained = BpeTrain.train(spark, sfDir, BpeServe.Rounds)
      .map { case (a, b, _) => (a, b) }.toVector
    val rank = trained.iterator.zipWithIndex.toMap
    val counts = scala.collection.mutable.Map.empty[String, Long]
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .flatMap(t => Bpe.encodeWith(t, rank, trained))
      .foreach(p => counts(p) = counts.getOrElse(p, 0L) + 1L)
    val brute = counts.toSeq
      .sortBy { case (p, c) => (-c, p) }.take(20).zipWithIndex
      .map { case ((p, c), i) => ((i + 1).toLong, p, c) }

    // engine arm: q99 over the published artifact
    val got = graft.SparkEntry.queries("q99_bpe_apply")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == brute,
      "q99 over the served table must equal the live-training brute apply")
    assert(got.exists(_._2.length > 1),
      "witness: some emitted piece must be an actual merge product")

    // and the served bytes ARE what the trainer produces
    assert(BpeServe.merges(spark, sfDir) == trained,
      "published merge table must equal live training output")
  }
}
