package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{ArtifactStore, SparkSpec}

/** `winnow_fp_v1` as a bucket-carried delta generation (r14 verdict
  * item 1, the top_next): q188/q191 used to re-winnow the whole corpus
  * per query while every sibling dup-index family was served from a
  * hard-link-carried store. Pins, in the ArtifactCarrySpec idiom:
  *
  *  - an append scans ONLY the appended corpus file
  *    (`CarryStat.scannedFiles`);
  *  - exactly the touched doc_id bucket rewrites; every other bucket
  *    is a HARD LINK (`rewrittenBuckets`/`linkedBuckets`, bytes pin,
  *    shared inodes);
  *  - the delta generation equals a from-scratch winnow row for row
  *    (batch parity — the selection served to q188/q191 is the inline
  *    derivation's);
  *  - q188/q191 read the store and answer exactly as the inline
  *    winnower would on the appended corpus.
  */
class WinnowCarrySpec extends SparkSpec {
  import spark.implicits._

  private val Key = "winnow_fp_v1"

  private def selRows(df: DataFrame): Set[(Long, Long)] =
    df.select(col("doc_id"), col("wmin"))
      .as[(Long, Long)].collect().toSet

  private def inlineSel(docs: DataFrame): Set[(Long, Long)] =
    selRows(AnalyticsQueries.winnowSelFor(docs.select("doc_id", "text")))

  test("append scans only the appended file, links untouched buckets, " +
    "and the served selection equals a from-scratch winnow") {
    val dir = Files.createTempDirectory("winnow_carry").toString
    // per-run SALT (the VecCellCarrySpec lesson): identical texts
    // across runs would qualify a leaked generation as a carry prior
    val salt = s"wsalt ${java.util.UUID.randomUUID.toString.take(8)} "
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), concat(lit(salt), col("text")).as("text"),
        col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))

    // corpus A: 300 docs in THREE part files
    val docsA = base.where(col("doc_id") < 300)
    docsA.repartition(3).write.parquet(s"$dir/documents.parquet")
    assert(selRows(AnalyticsQueries.winnowFpArtifact(spark, dir)) ==
      inlineSel(docsA), "generation A must equal the inline winnower")

    // corpus B: one appended part file, 5 docs all ≡ 0 (mod 64) — one
    // bucket under the small-corpus 8-bucket modulus
    val newIds = (0 until 5).map(i => 1024L + 64L * i)
    val appended = base.where(col("doc_id") < 5)
      .select(col("doc_id"),
        concat(lit("appended "), col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .collect().zip(newIds).map { case (r, id) =>
        (id, r.getString(1), r.getString(2), r.getString(3), r.getLong(4))
      }.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
    val filesBefore = Files.list(Paths.get(s"$dir/documents.parquet"))
      .toArray.map(_.toString).toSet
    appended.coalesce(1).write.mode("append")
      .parquet(s"$dir/documents.parquet")
    val newFiles = Files.list(Paths.get(s"$dir/documents.parquet"))
      .toArray.map(_.toString)
      .filter(p => !filesBefore(p) && p.endsWith(".parquet")).toSeq
    assert(newFiles.size == 1, s"append must add one part file: $newFiles")
    val docsB = docsA.unionByName(appended)

    // delta generation: row-identical to from-scratch, derived from
    // the appended file only, 7 of 8 buckets hard-linked
    assert(selRows(AnalyticsQueries.winnowFpArtifact(spark, dir)) ==
      inlineSel(docsB),
      "the bucket-carried delta generation must equal from-scratch")
    assert(ArtifactStore.deltaStats.get(Key) == ((300L, 5L)),
      s"append must carry 300 docs and re-winnow only the 5 new: " +
        s"${ArtifactStore.deltaStats.get(Key)}")
    val cs = ArtifactStore.carryStats.get(Key)
    assert(cs != null, "the bucket-carry path must record its stats")
    assert(cs.scannedFiles == newFiles,
      s"the carry must scan only the appended file: $cs")
    assert(cs.rewrittenBuckets == 1,
      s"all five appended ids land in one bucket — one rewrite: $cs")
    assert(cs.linkedBuckets == 7,
      s"the other 7 buckets must be hard links, not rewrites: $cs")
    assert(cs.bytesWritten < cs.bytesLinked / 4,
      s"bytes written must scale with the touched bucket, not the corpus: $cs")
    // shared inodes: a linked bucket's part files carry nlink ≥ 2
    val genDir = Paths.get(ArtifactStore.root, Key)
    val linkedPart = Files.walk(genDir).toArray.map(_.toString)
      .filter(p => p.contains("bck=1/") && p.endsWith(".parquet"))
    assert(linkedPart.exists { p =>
      Files.getAttribute(Paths.get(p), "unix:nlink")
        .asInstanceOf[Number].intValue >= 2
    }, "bucket-1 parts must be shared inodes across generations")

    // q188/q191 SERVE from the carried store: answers equal the
    // textbook tails over the inline selection on the appended corpus
    val sel = inlineSel(docsB)
    val selH = sel.groupBy(_._1).view
      .mapValues(_.map(_._2 / (1L << 21)).toSet).toMap
    val lens = docsB.select(col("doc_id"),
        split(trim(col("text")), "\\s+").as("w"))
      .select(col("doc_id"), greatest(size(col("w")).cast("long") - 3L,
        lit(0L)).as("n"))
      .as[(Long, Long)].collect().toMap
    val q188 = AnalyticsQueries.winnowFingerprint(spark, dir).collect()
    assert(q188.length == lens.size, "q188 must answer one row per doc")
    val dfH = selH.toSeq.flatMap { case (id, hs) => hs.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    q188.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == lens(id), s"doc $id n_grams")
      assert(r.getLong(2) == sel.count(_._1 == id).toLong, s"doc $id n_fp")
      assert(r.getLong(3) ==
        selH.getOrElse(id, Set.empty).count(h => dfH(h) >= 2).toLong,
        s"doc $id n_shared")
    }
    val rare = dfH.collect { case (h, n) if n <= 10 => h }.toSet
    val expPairs = (for {
      Seq(a, b) <- selH.keys.toSeq.sorted.combinations(2)
      shared = (selH(a) & selH(b) & rare).size
      if shared >= 3
    } yield (a, b)).toSet
    assert(AnalyticsQueries.winnowMatches(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == expPairs,
      "q191 off the carried store must equal the textbook pairing")
  }
}
