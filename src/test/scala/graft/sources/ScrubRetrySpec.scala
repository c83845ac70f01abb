package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Scrub-side bounded wait-and-retry over the mutation lease (the r14
  * ROADMAP follow-through): an erasure leg that collides with a live
  * ingest merge / carry build waits the holder out for a bounded
  * window instead of failing on first contact — while the retry NEVER
  * extends to a stolen lease (possibly-interleaved writes) and the
  * budget stays finite (a wedged holder still surfaces loudly).
  */
class ScrubRetrySpec extends SparkSpec {

  private def fsOf(target: String) =
    new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def leaseOf(target: String) =
    new org.apache.hadoop.fs.Path(target, "_mutate.lease")

  private def claimForeign(target: String): Unit = {
    val out = fsOf(target).create(leaseOf(target), false)
    try out.write("9999@other-host live-builder".getBytes("UTF-8"))
    finally out.close()
  }

  test("a scrub waits out a live holder and completes") {
    val target = Files.createTempDirectory("scrub_retry_wait").toString
    claimForeign(target)
    // "the build finishes": the foreign holder releases mid-retry
    val releaser = new Thread(() => {
      Thread.sleep(900)
      fsOf(target).delete(leaseOf(target), false)
    })
    releaser.start()
    var ran = false
    ScrubRetry.retryContended("spec-scrub", attempts = 6, backoffMs = 300) {
      MutationLease.withLease(spark, target) { ran = true }
    }
    releaser.join()
    assert(ran, "the scrub must run once the holder releases")
    assert(!fsOf(target).exists(leaseOf(target)), "released after the body")
  }

  test("the retry budget is bounded and re-raises the live contention") {
    val target = Files.createTempDirectory("scrub_retry_budget").toString
    claimForeign(target) // never released
    var tries = 0
    val e = intercept[IllegalStateException] {
      ScrubRetry.retryContended("spec-scrub", attempts = 3, backoffMs = 20) {
        tries += 1
        MutationLease.withLease(spark, target) {
          fail("the body must never run under a held lease")
        }
      }
    }
    assert(tries == 3, s"must use exactly the budget: $tries")
    assert(e.getMessage.contains("retry budget"), e.getMessage)
    assert(e.getCause.isInstanceOf[MutationLease.LeaseContended],
      s"the last contention must be the cause: ${e.getCause}")
  }

  test("a stolen lease is never retried") {
    var tries = 0
    val e = intercept[IllegalStateException] {
      ScrubRetry.retryContended("spec-scrub", attempts = 5, backoffMs = 20) {
        tries += 1
        // what releaseOwned throws when the body outlived its stale
        // window and a breaker reclaimed the target: NOT LeaseContended
        throw new IllegalStateException(
          "mutation lease was stolen while the mutation ran")
      }
    }
    assert(tries == 1, s"a stolen lease must fail on the first try: $tries")
    assert(e.getMessage.contains("stolen"), e.getMessage)
  }

  test("a real scrub leg retries through a transient foreign lease") {
    val target = Files.createTempDirectory("scrub_retry_leg").toString
    claimForeign(target)
    val releaser = new Thread(() => {
      Thread.sleep(900)
      fsOf(target).delete(leaseOf(target), false)
    })
    releaser.start()
    // StreamAnnIndex.scrub: registry append + (empty target) early out —
    // completes only if the wired retry waited the foreign holder out
    graft.streaming.StreamAnnIndex.scrub(spark, target, Seq(7L))
    releaser.join()
    assert(!fsOf(target).exists(leaseOf(target)))
  }
}
