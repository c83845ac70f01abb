package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** The per-store batch high-water note (r13 self-review finding 4),
  * hardened per the r13 ADVICE: the published bound is a SET of
  * uniquely named files read as a max — never absent or lowered
  * mid-raise — and a scrub REFUSES a note-less store that holds data
  * instead of silently registering an empty erasure window.
  */
class BatchHighWaterSpec extends SparkSpec {

  test("record is monotone and the bound survives torn notes and " +
    "interrupted sweeps") {
    val t = Files.createTempDirectory("bhw").toString
    assert(BatchHighWater.read(spark, t) == -1L, "no note yet")
    BatchHighWater.record(spark, t, 5L)
    assert(BatchHighWater.read(spark, t) == 5L)
    BatchHighWater.record(spark, t, 3L)
    assert(BatchHighWater.read(spark, t) == 5L, "a replay never lowers")
    BatchHighWater.record(spark, t, 9L)
    assert(BatchHighWater.read(spark, t) == 9L)
    // a torn note (unparseable content) must not erase the bound
    Files.writeString(Paths.get(t, "_maxbatch-torn"), "gar bage")
    assert(BatchHighWater.read(spark, t) == 9L)
    // the pre-r14 crash state: a raise that published the new note but
    // died before sweeping the old — both present, the max wins (the
    // old delete-then-rename scheme read -1 here)
    Files.writeString(Paths.get(t, "_maxbatch-12-crashed"), "12\n")
    assert(BatchHighWater.read(spark, t) == 12L)
    // the legacy single-file form is still honored
    val t2 = Files.createTempDirectory("bhw_legacy").toString
    Files.writeString(Paths.get(t2, "_maxbatch"), "4\n")
    assert(BatchHighWater.read(spark, t2) == 4L)
    BatchHighWater.record(spark, t2, 6L)
    assert(BatchHighWater.read(spark, t2) == 6L)
  }

  test("uptoForScrub refuses a note-less store that holds data") {
    val t = Files.createTempDirectory("bhw_scrub").toString
    // an empty (or absent) store genuinely has nothing replayable
    assert(BatchHighWater.uptoForScrub(spark, t) == -1L)
    assert(BatchHighWater.uptoForScrub(spark, s"$t/never-written") == -1L)
    // data with no note: the erasure window cannot be bounded — refuse
    Files.createDirectory(Paths.get(t, "flags"))
    Files.writeString(Paths.get(t, "flags", "part-00000.parquet"), "x")
    val e = intercept[IllegalStateException] {
      BatchHighWater.uptoForScrub(spark, t)
    }
    assert(e.getMessage.contains("Backfill"), e.getMessage)
    // the operator backfills and the scrub proceeds
    BatchHighWater.record(spark, t, 7L)
    assert(BatchHighWater.uptoForScrub(spark, t) == 7L)
  }
}
