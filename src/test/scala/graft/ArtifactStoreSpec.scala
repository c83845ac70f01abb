package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** ArtifactStore contract (r7 verdict item 3): artifacts survive the
  * JVM — a second session over the same corpus REUSES the published
  * parquet instead of rebuilding, a changed corpus (different
  * fingerprint) rebuilds, and the serve path reads exactly the bytes
  * that were published.
  */
class ArtifactStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshKey(tag: String) = s"spec_${tag}_${System.nanoTime()}"

  override def afterAll(): Unit = {
    // drop every spec_* artifact family this run created
    val root = Paths.get(ArtifactStore.root)
    if (Files.exists(root)) {
      val kids = Files.list(root)
      try kids.filter(_.getFileName.toString.startsWith("spec_"))
        .forEach { d =>
          val walk = Files.walk(d)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(Files.deleteIfExists(_))
          finally walk.close()
        }
      finally kids.close()
    }
    super.afterAll()
  }

  test("same fingerprint: the second session reads the artifact, builds nothing") {
    val key = freshKey("reuse")
    var builds = 0
    def once() = ArtifactStore.parquetOnce(spark, key, 42L) {
      builds += 1
      Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    }
    val first = once().orderBy("id").collect()
    assert(builds == 1 && first.length == 2)
    // a fresh JVM has no memo — only the on-disk manifest; simulate it
    ArtifactStore.resetMemoForTest()
    val second = once().orderBy("id").collect()
    assert(builds == 1, "second session must not re-run the build")
    assert(second.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // the artifact carries its fingerprint as a data column (the
    // oracle's glob+filter contract)
    assert(second.forall(r => r.getLong(r.fieldIndex("fp")) == 42L))
  }

  test("a build that consumes another artifact nests safely (no CHM re-entrancy)") {
    // the vec-codebook builders materialize the tombstone artifact from
    // INSIDE their own build thunk; under computeIfAbsent that violated
    // CHM's no-reentrant-mapping contract (hash-bin-dependent
    // "Recursive update"/deadlock). Builds now run under per-key locks.
    val inner = freshKey("nested_inner")
    val outer = freshKey("nested_outer")
    val out = ArtifactStore.parquetOnce(spark, outer, 7L) {
      val dep = ArtifactStore.parquetOnce(spark, inner, 7L) {
        Seq(1L, 2L).toDF("id")
      }
      dep.select((col("id") * 10).as("id"))
    }
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(10L, 20L))
    // the nested dependency published normally: a fresh JVM reuses it
    ArtifactStore.resetMemoForTest()
    var rebuilt = 0
    ArtifactStore.parquetOnce(spark, inner, 7L) {
      rebuilt += 1; Seq(9L).toDF("id")
    }
    assert(rebuilt == 0, "nested artifact must have been published")
  }

  test("stale fingerprint: a changed corpus rebuilds under a new path") {
    val key = freshKey("stale")
    var builds = 0
    def once(fp: Long) = ArtifactStore.parquetOnce(spark, key, fp) {
      builds += 1
      Seq((fp, "x")).toDF("v", "s")
    }
    once(1L).collect()
    once(2L).collect()
    assert(builds == 2, "a new fingerprint must rebuild")
    // both versions stay published side-by-side; a glob consumer
    // disambiguates on the fp column
    val all = spark.read.parquet(
      s"${ArtifactStore.root}/$key/*/data").select("fp").as[Long].collect()
    assert(all.toSet == Set(1L, 2L))
  }

  test("invalidate drops the artifact and the next consumer rebuilds") {
    val key = freshKey("inval")
    var builds = 0
    def once() = ArtifactStore.parquetOnce(spark, key, 7L) {
      builds += 1
      Seq(1L).toDF("v")
    }
    once().collect()
    ArtifactStore.invalidate(key, 7L)
    assert(!Files.exists(Paths.get(ArtifactStore.root, key, "fp-7")))
    once().collect()
    assert(builds == 2)
  }

  test("gcKeepLatest retains the newest fingerprints, deletes the rest") {
    val key = freshKey("gc")
    (1L to 4L).foreach { fp =>
      ArtifactStore.parquetOnce(spark, key, fp)(Seq(fp).toDF("v")).collect()
      // distinct publication times so retention order is well-defined
      Thread.sleep(15)
    }
    val deleted = ArtifactStore.gcKeepLatest(key, 2)
    assert(deleted.toSet == Set("fp-1", "fp-2"), s"deleted: $deleted")
    assert(!Files.exists(Paths.get(ArtifactStore.root, key, "fp-1")))
    assert(Files.exists(Paths.get(ArtifactStore.root, key, "fp-4")))
    // a GC'd fingerprint rebuilds transparently on next touch
    var rebuilt = false
    ArtifactStore.parquetOnce(spark, key, 1L) {
      rebuilt = true; Seq(1L).toDF("v")
    }.collect()
    assert(rebuilt, "a collected fingerprint must rebuild on demand")
  }

  test("embeddings fingerprint is corpus-sensitive and stable") {
    val a = ArtifactStore.embeddingsFp(spark, sfDir)
    val b = ArtifactStore.embeddingsFp(spark, sfDir)
    assert(a == b, "fingerprint must be deterministic")
    val c = ArtifactStore.embeddingsFp(spark, "/root/testdata/sf0.1")
    assert(a != c, "different corpora must fingerprint differently")
  }

  test("the served coarse book IS the published artifact's bytes") {
    val dir = "/root/testdata/sf0.001"
    val book = graft.llm.ServeBooks.coarse(spark, dir)
    val fp = ArtifactStore.embeddingsFp(spark, dir)
    val published = spark.read.parquet(
      s"${ArtifactStore.root}/${graft.llm.ServeBooks.CoarseKey}/fp-$fp/data")
      .select(col("cid"), col("dim"), col("cval"))
      .collect()
    assert(published.length == book.length * book(0).length)
    published.foreach { r =>
      assert(book(r.getLong(0).toInt)(r.getLong(1).toInt - 1) == r.getDouble(2))
    }
  }
}
