package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.StreamAnnServe

/** The drift-triggered serve-book refresh policy (r11 verdict item 2):
  * a stable corpus is a no-op, a drifted corpus retrains and publishes
  * a NEW generation, and a live serve stream pinned to the old
  * generation answers byte-identically across the background refresh —
  * the generation contract in action.
  */
class ServeBookRefreshSpec extends SparkSpec {
  import spark.implicits._

  private def bits(b: Array[Array[Double]]): Seq[Long] =
    b.flatten.toSeq.map(java.lang.Double.doubleToLongBits)

  test("stable corpus: no-op; drifted corpus: retrain + republish; " +
    "live stream byte-unchanged across the background refresh") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = Files.createTempDirectory("serve_refresh").toString
    val full = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dirA = s"$tmp/a"; val dirB = s"$tmp/b"; val dirC = s"$tmp/c"
    try {
      runScenario(full, dirA, dirB, dirC, s"$tmp/answers", s"$tmp/ckpt")
    } finally {
      // drop this spec's serve-cells generations: the fixture corpora
      // share the main corpus's vec_id space, so a leaked generation
      // would trip StreamAnnServeSpec's "no published generation holds
      // the victim's bytes" sweep (same-id, DIFFERENT corpus — exactly
      // the cross-corpus scoping that sweep is not about)
      Seq(dirA, dirB, dirC).foreach { d =>
        ServeBooks.annCellsFpsFor(spark, d).foreach(
          graft.ArtifactStore.invalidate(ServeBooks.AnnCellsKey, _))
      }
    }
  }

  private def runScenario(full: org.apache.spark.sql.DataFrame,
                          dirA: String, dirB: String, dirC: String,
                          out: String, ckpt: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    // corpus A: the first 300 vectors, a deployment of its own
    full.where(col("vec_id") < 300)
      .write.parquet(s"$dirA/embeddings.parquet")
    val pathA = ServeBooks.annCellsPath(spark, dirA)

    // the generation is self-describing: its book sidecar carries the
    // exact doubles that assigned its cells
    assert(bits(ServeBooks.generationBook(spark, pathA)) ==
      bits(ServeBooks.coarse(spark, dirA)),
      "the sidecar must round-trip the frozen book bit-for-bit")

    // STABLE corpus: drift is exactly zero, the policy is a no-op, and
    // nothing new is published
    val fpsBefore = graft.ArtifactStore.publishedFps(ServeBooks.AnnCellsKey).toSet
    assert(ServeBooks.serveDriftRms(spark, dirA, pathA) == 0.0)
    assert(ServeBooks.refreshIfDrifted(spark, dirA, pathA) == ServeBooks.Stable,
      "a stable corpus must not trigger a refresh")
    assert(graft.ArtifactStore.publishedFps(ServeBooks.AnnCellsKey).toSet ==
      fpsBefore, "a no-op refresh must publish nothing")

    // APPENDED corpus within the drift threshold → EXTENDED: the new
    // corpus's generation is published UNDER THE FROZEN BOOK, carrying
    // the 300 unchanged vectors and assigning only the 50 appended ones
    full.where(col("vec_id") < 350)
      .write.parquet(s"$dirC/embeddings.parquet")
    val ext = ServeBooks.refreshIfDrifted(spark, dirC, pathA,
      threshold = Double.MaxValue) // force the within-threshold arm
    val pathC = ext match {
      case ServeBooks.Extended(p) => p
      case other => fail(s"append within threshold must Extend, got $other")
    }
    assert(pathC != pathA, "the extension must be a NEW generation")
    assert(bits(ServeBooks.generationBook(spark, pathC)) ==
      bits(ServeBooks.coarse(spark, dirA)),
      "the extended generation must keep the FROZEN book")
    assert(graft.ArtifactStore.deltaStats.get(ServeBooks.AnnCellsKey) ==
      ((300L, 50L)),
      s"extension must carry 300 vectors and assign only the 50 new: " +
        s"${graft.ArtifactStore.deltaStats.get(ServeBooks.AnnCellsKey)}")
    // the delta-carried generation equals a from-scratch assignment of
    // the grown corpus under the frozen book, and every row carries the
    // NEW corpus's fingerprint
    val bookA = ServeBooks.coarse(spark, dirA)
    val expectedC = full.where(col("vec_id") < 350)
      .select(col("vec_id"), VectorOps.toDoubleArr(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
      .withColumn("cell", ServeBooks.cell(bookA, col("v")))
    def cellRows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("cell").cast("long"), col("nrm"), col("v"))
      .collect().map { r =>
        (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getSeq[Double](3))
      }.toSet
    assert(cellRows(spark.read.parquet(pathC)) == cellRows(expectedC),
      "delta-carried cells must equal the from-scratch frozen-book build")
    // generation identity: the corpus attribution comes from the
    // generation-level `corpus` note (rows carry no fp stamp in the
    // cell-carried layout — hard-linked files would disagree with it),
    // and the corpus-scoped enumerator must attribute the generation to
    // corpus C and NOT to corpus A
    val fpOfC = graft.ArtifactStore.embeddingsFp(spark, dirC)
    assert(ServeBooks.annCellsFpsFor(spark, dirC).map(f =>
      graft.ArtifactStore.dataPath(ServeBooks.AnnCellsKey, f))
      .contains(pathC),
      "the extended generation must be attributed to the NEW corpus")
    val pathCFp = new java.io.File(pathC).getParentFile.getName
      .stripPrefix("fp-").toLong
    assert(graft.ArtifactStore.generationCorpusFp(spark,
      ServeBooks.AnnCellsKey, pathCFp).contains(fpOfC),
      "the generation's corpus note must record corpus C's fingerprint")

    // a live stream pins generation A and answers a batch
    val queries = full.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qv"))
      .as[(Long, Seq[Double])].collect().toSeq
    val stream = MemoryStream[(Long, Seq[Double])]
    val q = StreamAnnServe.start(
      stream.toDS().toDF("query_id", "qv"), dirA, out, ckpt)
    val refreshed = try {
      stream.addData(queries); q.processAllAvailable()

      // DRIFTED corpus: same deployment, new corpus version whose
      // geometry moved (every component negated — centroids flip sign,
      // RMS displacement far above the threshold)
      full.where(col("vec_id") < 300)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(-x AS FLOAT))").as("embedding"),
          col("label"))
        .write.parquet(s"$dirB/embeddings.parquet")
      assert(ServeBooks.serveDriftRms(spark, dirB, pathA) > ServeBooks.RefreshRms,
        "witness: the negated corpus must read as drifted")
      val pathB = ServeBooks.refreshIfDrifted(spark, dirB, pathA) match {
        case ServeBooks.Retrained(p) => p
        case other => fail(s"a drifted corpus must Retrain, got $other")
      }
      assert(pathB != pathA, "the refresh must be a NEW generation")
      assert(bits(ServeBooks.generationBook(spark, pathB)) ==
        bits(ServeBooks.coarse(spark, dirB)),
        "the new generation must carry the retrained book")
      // and the new generation is itself now stable
      assert(ServeBooks.refreshIfDrifted(spark, dirB, pathB) ==
        ServeBooks.Stable)

      // the LIVE stream keeps its frozen generation: the same queries
      // answered after the background refresh are byte-identical
      stream.addData(queries); q.processAllAvailable()
      pathB
    } finally q.stop()

    val answers = spark.read.parquet(out).collect().map { r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("rn"),
        r.getAs[Long]("neighbor_id"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("cos")))
    }
    assert(answers.nonEmpty && answers.length % 2 == 0)
    assert(answers.distinct.length == answers.length / 2,
      "every (query, rank) must repeat with identical neighbor and " +
        "cosine bits across the refresh")
    assert(refreshed != pathA)
    ()
  }

  test("pq-res codes: append under kept books re-encodes only the " +
    "delta, and the delta-built generation equals a from-scratch build") {
    val tmp = Files.createTempDirectory("codes_delta").toString
    val full = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dirA = s"$tmp/a"; val dirC = s"$tmp/c"
    full.where(col("vec_id") < 300).write.parquet(s"$dirA/embeddings.parquet")
    full.where(col("vec_id") < 350).write.parquet(s"$dirC/embeddings.parquet")
    val coarseA = ServeBooks.coarse(spark, dirA)
    val resA = ServeBooks.pqRes(spark, dirA)
    val fpA = ServeBooks.pqResCodesFp(spark, dirA, coarseA, resA)
    val fpC = ServeBooks.pqResCodesFp(spark, dirC, coarseA, resA)
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("cell"), col("codes"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSet
    try {
      // generation A: first build of the family in this store — or a
      // delta from some prior generation; either way it must cover
      // exactly corpus A
      val rowsA = rowsOf(ServeBooks.pqResCodesFor(spark, dirA, coarseA, resA))
      assert(rowsA.map(_._1) == (0L until 300L).toSet)

      // generation C under the SAME books: 300 carried, 50 re-encoded
      val deltaRows = rowsOf(ServeBooks.pqResCodesFor(spark, dirC, coarseA, resA))
      assert(graft.ArtifactStore.deltaStats.get(ServeBooks.PqResCodesKey) ==
        ((300L, 50L)),
        s"append under kept books must re-encode only the delta: " +
          s"${graft.ArtifactStore.deltaStats.get(ServeBooks.PqResCodesKey)}")
      assert(deltaRows.map(_._1) == (0L until 350L).toSet)

      // the acid test: drop BOTH generations and rebuild C with no
      // prior — the from-scratch encode must equal the delta build
      // row-for-row (same cells, same codeword ids)
      graft.ArtifactStore.invalidate(ServeBooks.PqResCodesKey, fpA)
      graft.ArtifactStore.invalidate(ServeBooks.PqResCodesKey, fpC)
      val fullRows = rowsOf(ServeBooks.pqResCodesFor(spark, dirC, coarseA, resA))
      assert(graft.ArtifactStore.deltaStats.get(ServeBooks.PqResCodesKey) ==
        ((-1L, -1L)), "the rebuild must have run with no prior")
      assert(deltaRows == fullRows,
        "delta-built codes must equal the from-scratch encode")
    } finally {
      Seq(dirA, dirC).foreach { d =>
        ServeBooks.pqResCodesFpsFor(spark, d).foreach(
          graft.ArtifactStore.invalidate(ServeBooks.PqResCodesKey, _))
      }
    }
  }

  test("the carry certificate is adversary-proof: a scrubbed victim " +
    "and a sum-preserving component swap are both rebuilt, never carried") {
    // two r12 self-review findings, one fixture: (a) a takedown scrub
    // must also forget the victim in the generation's vecs sidecar, or
    // an Extended successor (whose OWN tombstone set starts empty)
    // certifies it 'unchanged', carries zero rows for it, and silently
    // omits a vector a full build includes; (b) the certificate must
    // be ORDER-SENSITIVE — the corpus-fingerprint digest SUMS the
    // milli quanta, so swapping two components leaves it unchanged and
    // stale geometry would be carried.
    val tmp = Files.createTempDirectory("carry_adversary").toString
    val full = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dirA = s"$tmp/a"; val dirC = s"$tmp/c"
    full.where(col("vec_id") < 300).write.parquet(s"$dirA/embeddings.parquet")
    val pathA = ServeBooks.annCellsPath(spark, dirA)
    val bookA = ServeBooks.generationBook(spark, pathA)
    try {
      // takedown in deployment A: scrubs generation A's rows AND its
      // carry certificate
      assert(graft.sources.VecTakedown.flag(spark, dirA, Seq(5L)) == 1L)
      assert(spark.read.parquet(pathA)
        .where(col("vec_id") === 5L).count() == 0L)

      // successor corpus: A's 300 vectors (victim content INCLUDED —
      // fresh corpus, empty tombstone set) with vec 7's first two
      // components SWAPPED (sum-preserving!), plus 20 appended
      val swapped = full.where(col("vec_id") < 300)
        .select(col("vec_id"),
          expr("IF(vec_id = 7, concat(array(embedding[1], embedding[0]), " +
            "slice(embedding, 3, 62)), embedding)").as("embedding"),
          col("label"))
      val appended = full.where(col("vec_id") >= 300 && col("vec_id") < 320)
        .select(swapped.columns.map(col): _*)
      swapped.unionByName(appended).write.parquet(s"$dirC/embeddings.parquet")

      val pathC = ServeBooks.refreshIfDrifted(spark, dirC, pathA,
        threshold = Double.MaxValue) match {
        case ServeBooks.Extended(p) => p
        case other => fail(s"expected Extended, got $other")
      }
      // 298 of the 300 base vectors carried; rebuilt: victim 5
      // (certificate scrubbed), vec 7 (the swap must MISS the
      // order-sensitive certificate), and the 20 appended
      assert(graft.ArtifactStore.deltaStats.get(ServeBooks.AnnCellsKey) ==
        ((298L, 22L)),
        s"carry/rebuild split wrong: " +
          s"${graft.ArtifactStore.deltaStats.get(ServeBooks.AnnCellsKey)}")
      // row-for-row against an inline from-scratch assignment of the
      // successor corpus under the frozen book — catches BOTH a
      // silently-omitted victim and carried stale geometry for vec 7
      val expected = spark.read.parquet(s"$dirC/embeddings.parquet")
        .select(col("vec_id"), VectorOps.toDoubleArr(col("embedding")).as("v"))
        .withColumn("nrm", VectorOps.norm(col("v")))
        .withColumn("cell", ServeBooks.cell(bookA, col("v")))
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select(col("vec_id"), col("cell").cast("long"), col("nrm"), col("v"))
        .collect().map { r =>
          (r.getLong(0), r.getLong(1),
            java.lang.Double.doubleToLongBits(r.getDouble(2)),
            r.getSeq[Double](3))
        }.toSet
      assert(rows(spark.read.parquet(pathC)) == rows(expected),
        "the Extended generation must equal the from-scratch build " +
          "(victim present, swapped vector re-assigned)")
      assert(spark.read.parquet(pathC)
        .where(col("vec_id") === 5L).count() == 1L,
        "the successor corpus's copy of the erased id must be present")
    } finally {
      graft.sources.VecTakedown.reset(spark, dirA)
      Seq(dirA, dirC).foreach { d =>
        ServeBooks.annCellsFpsFor(spark, d).foreach(
          graft.ArtifactStore.invalidate(ServeBooks.AnnCellsKey, _))
      }
    }
  }
}
