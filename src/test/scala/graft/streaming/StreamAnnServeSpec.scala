package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.llm.{ServeBooks, VectorOps}

/** The live ANN server answers exactly like the batch index: streaming
  * q55's query set through StreamAnnServe (in two micro-batches, out of
  * order) yields row-for-row the q55 result — online serving and
  * offline evaluation agree on every neighbor and every cosine bit.
  * The serve path reads the cell-partitioned artifact under a
  * partition filter (pinned below) and persists nothing corpus-sized.
  */
class StreamAnnServeSpec extends SparkSpec {
  import spark.implicits._

  test("streamed answers equal batch q55 row-for-row") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ann_serve").toString
    val out = s"$dir/answers"; val ckpt = s"$dir/ckpt"

    // q55's query set: vec_id < 50, as (query_id, qv) rows
    val queries = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qv"))
      .as[(Long, Seq[Double])].collect().toSeq

    val stream = MemoryStream[(Long, Seq[Double])]
    val query = StreamAnnServe.start(
      stream.toDS().toDF("query_id", "qv"), sfDir, out, ckpt)
    try {
      val (late, early) = queries.partition(_._1 % 2 == 0)
      stream.addData(early); query.processAllAvailable()
      stream.addData(late); query.processAllAvailable()
    } finally query.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("rn"))
    val served = spark.read.parquet(out).collect()
      .map(r => key(r) -> ((r.getAs[Long]("neighbor_id"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("cos"))))).toMap
    val batch = graft.SparkEntry.queries("q55_knn_ivf")(spark, sfDir)
      .collect()
      .map(r => key(r) -> ((r.getAs[Long]("neighbor_id"),
        java.lang.Double.doubleToLongBits(r.getAs[Double]("cos"))))).toMap
    assert(served.nonEmpty, "witness: the server must answer something")
    assert(served == batch,
      "live ANN answers must equal batch q55 bit-for-bit")
  }

  test("radius answers off the live serve feed equal batch q194 " +
    "row-for-row at a quiesced boundary") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ann_serve_radius").toString
    val out = s"$dir/answers"; val ckpt = s"$dir/ckpt"

    val queries = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qv"))
      .as[(Long, Seq[Double])].collect().toSeq

    // startup window: before the loop commits anything, the recall
    // monitor reports zero hits — it must not throw on the missing dir
    val cold = StreamAnnServe.radiusRecallAudit(spark, sfDir, out)
    assert(cold.count() > 0 &&
      cold.agg(max(col("hits"))).head.getLong(0) == 0L,
      "a pre-serve audit must report the truth balls with zero hits")

    val stream = MemoryStream[(Long, Seq[Double])]
    val query = StreamAnnServe.startRadius(
      stream.toDS().toDF("query_id", "qv"), sfDir, out, ckpt)
    try {
      val (late, early) = queries.partition(_._1 % 2 == 0)
      stream.addData(early); query.processAllAvailable()
      stream.addData(late); query.processAllAvailable()
    } finally query.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        java.lang.Double.doubleToLongBits(r.getAs[Double]("cos"))).toMap
    val served = rows(spark.read.parquet(out))
    val batch = rows(
      graft.SparkEntry.queries("q194_radius_search_ivf")(spark, sfDir))
    assert(served.nonEmpty, "witness: the ball must be populated")
    assert(served == batch,
      "live radius answers must equal batch q194 bit-for-bit")

    // r15 verdict item 4 — the serve loop's RECALL TWIN: the q198
    // audit over the live feed's answers must equal batch q198
    // row-for-row at this quiesced boundary (same truth arm, same
    // recall tail, served feed pinned equal above)
    def audit(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("ball"), r.getAs[Long]("hits"),
          r.getAs[Long]("recall_milli")))).toMap
    val live = audit(StreamAnnServe.radiusRecallAudit(spark, sfDir, out))
    val batchAudit = audit(
      graft.SparkEntry.queries("q198_radius_recall")(spark, sfDir))
    assert(live.nonEmpty, "witness: the audit must cover the queries")
    assert(live == batchAudit,
      "the live radius recall audit must equal batch q198 row-for-row")
  }

  test("diversified (MMR) answers off the live serve feed equal batch " +
    "q190 row-for-row at a quiesced boundary") {
    // r14 verdict item 3: the serving tier's shape is mmrOver fed by
    // StreamAnnServe's candidates (tombstone-excluded) — one reranker,
    // two feeds. Streaming q190's query set through startDiversified
    // in two out-of-order micro-batches must reproduce batch q190
    // bit-for-bit: the live store and the batch cells frame hold the
    // same (v, nrm, cell) rows at a quiesced boundary, and the
    // shortlist/greedy arithmetic is the same code path.
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ann_serve_mmr").toString
    val out = s"$dir/answers"; val ckpt = s"$dir/ckpt"

    val queries = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qv"))
      .as[(Long, Seq[Double])].collect().toSeq

    val stream = MemoryStream[(Long, Seq[Double])]
    val query = StreamAnnServe.startDiversified(
      stream.toDS().toDF("query_id", "qv"), sfDir, out, ckpt)
    try {
      val (late, early) = queries.partition(_._1 % 2 == 0)
      stream.addData(early); query.processAllAvailable()
      stream.addData(late); query.processAllAvailable()
    } finally query.stop()

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("step")) ->
        ((r.getAs[Long]("neighbor_id"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("rel")),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("mmr"))))).toMap
    val served = rows(spark.read.parquet(out))
    val batch = rows(
      graft.SparkEntry.queries("q190_mmr_rerank_ivf")(spark, sfDir))
    assert(served.nonEmpty, "witness: the server must answer something")
    assert(served == batch,
      "live diversified answers must equal batch q190 bit-for-bit")
  }

  test("the per-batch candidate read prunes to the probed cells") {
    val dataPath = ServeBooks.annCellsPath(spark, sfDir)
    // two cells that actually exist on disk (any would do — the pin is
    // about the SCAN shape, not which cells a given query probes)
    val present = spark.read.parquet(dataPath)
      .select(col("cell")).distinct().orderBy(col("cell"))
      .limit(2).collect().map(_.getInt(0)).toSeq
    assert(present.size == 2, "witness: the artifact must span ≥2 cells")
    val df = StreamAnnServe.candidates(spark, dataPath, present)
    val scans = df.queryExecution.executedPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
    }
    assert(scans.nonEmpty, "the candidate read must be a file scan")
    assert(scans.head.partitionFilters.nonEmpty,
      "the probed-cells predicate must reach the scan as a partition filter")
    assert(scans.head.selectedPartitions.partitionCount == present.size,
      s"expected exactly the ${present.size} probed cell directories, got " +
        s"${scans.head.selectedPartitions.partitionCount}")
    // r10 verdict item 1's other half: the corpus side is a pruned file
    // read, never a full-corpus cache (the pre-r11 serve persisted the
    // whole corpus and streamed every partition per batch)
    assert(df.queryExecution.optimizedPlan.collect {
      case m: org.apache.spark.sql.execution.columnar.InMemoryRelation => m
    }.isEmpty, "the serve corpus side must not be a persisted relation")
  }

  test("a mid-stream takedown stops serving the victim at the next batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("ann_serve_td").toString
    val out = s"$dir/answers"; val ckpt = s"$dir/ckpt"

    val queries = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") < 50)
      .select(col("vec_id").as("query_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qv"))
      .as[(Long, Seq[Double])].collect().toSeq
    val (early, late) = queries.partition(_._1 < 25)

    // freeze the pre-takedown book, and an expected-arm cells frame
    // built INDEPENDENTLY from the corpus parquet (the artifact gets
    // scrubbed mid-test; the oracle side must not read it)
    val book = ServeBooks.coarse(spark, sfDir)
    val cells = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), VectorOps.toDoubleArr(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
      .withColumn("cell", ServeBooks.cell(book, col("v")))
      .localCheckpoint()

    try {
      val stream = MemoryStream[(Long, Seq[Double])]
      val query = StreamAnnServe.start(
        stream.toDS().toDF("query_id", "qv"), sfDir, out, ckpt)
      val victim =
        try {
          stream.addData(early); query.processAllAvailable()
          // victim: a non-query vector the early answers actually served
          val v = spark.read.parquet(out)
            .where(col("neighbor_id") >= 50)
            .orderBy(col("neighbor_id")).limit(1)
            .select("neighbor_id").as[Long].head()
          assert(graft.sources.VecTakedown.flag(spark, sfDir, Seq(v)) == 1L)
          stream.addData(late); query.processAllAvailable()
          v
        } finally query.stop()

      val lateIds = late.map(_._1).toSet
      val lateAnswers = spark.read.parquet(out)
        .where(col("query_id").isin(lateIds.toSeq: _*))
      assert(lateAnswers.where(col("neighbor_id") === victim).count() == 0L,
        "post-takedown batches must not serve the flagged vector")
      // ...while the already-served early answers are untouched history
      assert(spark.read.parquet(out)
        .where(!col("query_id").isin(lateIds.toSeq: _*))
        .where(col("neighbor_id") === victim).count() > 0L,
        "witness: the victim was actually being served before the flag")
      // exclusion, not truncation: every late query still gets a full
      // top-K (a new 5th neighbor replaces the victim where it ranked)
      val depths = lateAnswers.groupBy("query_id")
        .agg(count(lit(1)).as("n"), max(col("rn")).as("mx"))
        .where(col("n") =!= StreamAnnServe.K.toLong ||
          col("mx") =!= StreamAnnServe.K.toLong)
      assert(depths.isEmpty, "late answers must stay exactly K deep")
      // and the late batch equals the frozen-book pipeline over the
      // tombstone-filtered corpus — the refresh changed ONLY the
      // exclusion set, not the serve math
      val expected = StreamAnnServe.answerBatch(
        cells.where(col("vec_id") =!= victim), book)(
          late.toDF("query_id", "qv"))
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
        (r.getAs[Long]("query_id"), r.getAs[Long]("rn"),
          r.getAs[Long]("neighbor_id"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("cos")))
      }.toSet
      assert(rows(lateAnswers) == rows(expected),
        "late answers must equal the frozen-book serve minus the victim")
      // erasure reached the pinned artifact too: the takedown scrubbed
      // the victim's row out of the frozen serve-cells generation in
      // place (not just the anti-join) — no published generation OF
      // THIS CORPUS holds the deleted vector's bytes. Scoped via
      // annCellsFpsFor, matching the scrub's own content-scoped
      // contract: a generation of a DIFFERENT corpus (another scale
      // factor or a salted spec fixture sharing the store) may hold
      // the same numeric vec_id bound to different bytes, and the
      // scrub rightly leaves it alone.
      val thisCorpus = ServeBooks.annCellsFpsFor(spark, sfDir).toSet
      assert(thisCorpus.nonEmpty,
        "witness: the serving generation must belong to this corpus")
      thisCorpus.foreach { fp =>
        assert(spark.read.parquet(
            graft.ArtifactStore.dataPath(ServeBooks.AnnCellsKey, fp))
          .where(col("vec_id") === victim).count() == 0L,
          s"serve-cells generation fp-$fp must not retain the victim's row")
      }
    } finally {
      graft.sources.VecTakedown.reset(spark, sfDir)
    }
  }
}
