package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Replayable file source (the fault-tolerant alternative to the
  * reference's unreliable socket receiver, SURVEY §2.10 delivery):
  * envelope lines dropped as text files are picked up exactly once per
  * file by Structured Streaming's file source.
  */
class FileStreamSpec extends SparkSpec {

  test("text-file stream decodes envelopes exactly once per file") {
    val inDir = Files.createTempDirectory("graft-filesrc").toString
    Files.writeString(Paths.get(s"$inDir/batch1.txt"),
      """["4,good day","0,bad day"]""" + "\n")
    Files.writeString(Paths.get(s"$inDir/batch2.txt"),
      """["4,more good"]""" + "\n")

    val lines = spark.readStream.text(inDir)
    val records = Ingest.decodeEnvelope(lines)
    val query = records.writeStream.format("memory")
      .queryName("file_src_test").outputMode("append").start()
    try {
      query.processAllAvailable()
      // re-processing must not duplicate already-seen files
      query.processAllAvailable()
      val rows = spark.table("file_src_test").collect()
      assert(rows.length == 3, rows.mkString(";"))
      assert(rows.map(_.getString(0)).count(_ == "4") == 2)
    } finally query.stop()
  }
}
