package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Replayable file source + file sink (the fault-tolerant alternative to
  * the reference's unreliable socket receiver, SURVEY §2.10 delivery):
  * each input file is processed exactly once, including across a query
  * restart from the same checkpoint.
  */
class FileStreamSpec extends SparkSpec {

  test("file source→sink delivers each file exactly once across a checkpointed restart") {
    val inDir = Files.createTempDirectory("graft-filesrc").toString
    val outDir = Files.createTempDirectory("graft-fileout").toString + "/out"
    val ckpt = Files.createTempDirectory("graft-filesrc-ckpt").toString
    Files.writeString(Paths.get(s"$inDir/batch1.txt"),
      """["4,good day","0,bad day"]""" + "\n")

    def start() = Ingest.decodeEnvelope(spark.readStream.text(inDir))
      .writeStream.format("json").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.schema(Ingest.RecordSchema).json(outDir).count() == 2)

    // restart from the same checkpoint: batch1 must NOT replay into the
    // sink, the new file must be appended exactly once
    Files.writeString(Paths.get(s"$inDir/batch2.txt"),
      """["4,more good"]""" + "\n")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read.schema(Ingest.RecordSchema).json(outDir).collect()
    assert(rows.length == 3, rows.mkString(";"))
    assert(rows.count(_.getString(1) == "more good") == 1)
    assert(rows.count(_.getString(1) == "good day") == 1)
  }
}
