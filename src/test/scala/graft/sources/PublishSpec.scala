package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Publish layout for a curated corpus: the shape of the final write
  * matters as much as the plan that produced it at 100 TB — consumers
  * prune by partition directory, file counts bound task counts, and
  * within-file ordering drives parquet page/rowgroup skipping.
  *
  * Demonstrates and locks in: `partitionBy` directory layout,
  * `maxRecordsPerFile` file-size capping, and `sortWithinPartitions`
  * clustering — all on the standard DataFrameWriter, no custom sink.
  */
class PublishSpec extends SparkSpec {

  test("partitionBy + maxRecordsPerFile + sortWithinPartitions publish layout") {
    val dir = Files.createTempDirectory("publish").toString + "/corpus"
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "n_chars")
    val langs = docs.select("lang").distinct().collect()
      .map(_.getString(0)).toSet

    docs.sortWithinPartitions("lang", "doc_id")
      .write
      .partitionBy("lang")
      .option("maxRecordsPerFile", 100)
      .parquet(dir)

    // 1. directory layout: one lang=<value> partition dir per language
    val base = new java.io.File(dir)
    val partDirs = base.listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(partDirs == langs.map(l => s"lang=$l"),
      s"expected one dir per lang, got $partDirs")

    // 2. file-size cap: no parquet file holds more than 100 records
    val withFile = spark.read.parquet(dir)
      .select(input_file_name().as("f"))
      .groupBy("f").count().collect()
    assert(withFile.nonEmpty)
    withFile.foreach(r =>
      assert(r.getLong(1) <= 100, s"${r.getString(0)} has ${r.getLong(1)} rows"))
    // the cap actually bit somewhere (a lang with >100 docs split files)
    assert(withFile.length > langs.size,
      "expected at least one partition to split under the record cap")

    // 3. within-file clustering: every file is sorted by doc_id, so
    // parquet min/max page stats actually skip
    val perFile = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("doc_id"))
      .collect().groupBy(_.getString(0))
    perFile.foreach { case (f, rs) =>
      val ids = rs.map(_.getLong(1))
      assert(ids.sameElements(ids.sorted), s"$f not clustered by doc_id")
    }

    // 4. the partition column round-trips through the directory name
    val back = spark.read.parquet(dir)
    assert(back.where(col("lang") === langs.head).count() ==
      docs.where(col("lang") === langs.head).count())
  }
}
