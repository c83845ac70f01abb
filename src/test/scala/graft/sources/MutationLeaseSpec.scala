package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** The cross-process mutation lease (r12 verdict item 2): single
  * writer per storage target enforced by an on-disk lease file, not a
  * documented invariant. A held lease fails the second mutator LOUDLY
  * (the two-session interleave made impossible), a crashed holder's
  * stale lease is broken, and the lease always releases — success,
  * failure, or nested re-entry.
  */
class MutationLeaseSpec extends SparkSpec {

  private def fsOf(target: String) =
    new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def leaseOf(target: String) =
    new org.apache.hadoop.fs.Path(target, "_mutate.lease")

  test("a lease held by another process fails the second mutator loudly") {
    val target = Files.createTempDirectory("lease_conflict").toString
    val fs = fsOf(target)
    // "session A" (a different JVM): claim the lease out-of-band
    val out = fs.create(leaseOf(target), false)
    try out.write("9999@other-host test-holder".getBytes("UTF-8"))
    finally out.close()

    val e = intercept[IllegalStateException] {
      MutationLease.withLease(spark, target) {
        fail("the body must never run under a held lease")
      }
    }
    assert(e.getMessage.contains("another process"), e.getMessage)
    assert(e.getMessage.contains("test-holder"),
      s"the failure must name the holder: ${e.getMessage}")
    // the failed claim must not have disturbed the holder's lease
    assert(fs.exists(leaseOf(target)))
  }

  test("a stale lease (crashed holder) is broken and the mutation runs") {
    val target = Files.createTempDirectory("lease_stale").toString
    val fs = fsOf(target)
    val out = fs.create(leaseOf(target), false)
    try out.write("dead holder".getBytes("UTF-8")) finally out.close()
    fs.setTimes(leaseOf(target), System.currentTimeMillis() - 3600000L, -1)

    var ran = false
    MutationLease.withLease(spark, target) { ran = true }
    assert(ran, "the stale lease must be broken, not block the mutation")
    assert(!fs.exists(leaseOf(target)), "released after the body")
  }

  test("a lease stolen while the body runs fails loudly instead of " +
    "reporting success") {
    val target = Files.createTempDirectory("lease_stolen").toString
    val fs = fsOf(target)
    val e = intercept[IllegalStateException] {
      MutationLease.withLease(spark, target) {
        // "another process" presumed us crashed (the body outlived the
        // stale window), broke our lease, and claimed its own
        fs.delete(leaseOf(target), false)
        val out = fs.create(leaseOf(target), false)
        try out.write("9999@other-host thief".getBytes("UTF-8"))
        finally out.close()
        "body-completed"
      }
    }
    assert(e.getMessage.contains("stolen"), e.getMessage)
    // release must never delete the thief's lease
    val in = fs.open(leaseOf(target))
    val holder = try scala.io.Source.fromInputStream(in).mkString.trim
                 finally in.close()
    assert(holder.contains("thief"),
      s"the successor's lease must survive our release: $holder")
  }

  test("a body that outlives the stale window keeps its lease (heartbeat)") {
    val target = Files.createTempDirectory("lease_heartbeat").toString
    val fs = fsOf(target)
    val staleMs = 600L
    MutationLease.withLease(spark, target, staleMs = staleMs) {
      Thread.sleep(staleMs * 3) // far past the window
      // a concurrent breaker decides on mtime age: the heartbeat must
      // have kept it fresh, so this holder can never be presumed dead
      val age = System.currentTimeMillis() -
        fs.getFileStatus(leaseOf(target)).getModificationTime
      assert(age < staleMs,
        s"lease aged $age ms under a $staleMs ms window — heartbeat dead")
    }
    assert(!fs.exists(leaseOf(target)), "released after the body")
  }

  test("the heartbeat never resurrects a thief's lease") {
    val target = Files.createTempDirectory("lease_no_resurrect").toString
    val fs = fsOf(target)
    val staleMs = 600L
    intercept[IllegalStateException] {
      MutationLease.withLease(spark, target, staleMs = staleMs) {
        // a breaker stole the lease mid-body
        fs.delete(leaseOf(target), false)
        val out = fs.create(leaseOf(target), false)
        try out.write("9999@other-host thief".getBytes("UTF-8"))
        finally out.close()
        val stolenAt = fs.getFileStatus(leaseOf(target)).getModificationTime
        Thread.sleep(staleMs * 2) // several heartbeat periods
        val mtime = fs.getFileStatus(leaseOf(target)).getModificationTime
        assert(mtime == stolenAt,
          "our heartbeat must not touch a lease we no longer hold")
      }
    }
    // the thief's lease survives our release
    val in = fs.open(leaseOf(target))
    val holder = try scala.io.Source.fromInputStream(in).mkString.trim
                 finally in.close()
    assert(holder.contains("thief"))
  }

  test("a persistently unreadable lease degrades VISIBLY, not silently") {
    // r15 ADVICE: the heartbeat's None branch retried silently every
    // period — a lease file deleted/unreadable by an external actor for
    // the REST of a mutation meant renewal was effectively off with no
    // warning, contradicting the degradation-is-visible contract. A
    // None streak outliving the stale window must now degrade() (warn
    // once, recorded observably); release still arbitrates loudly.
    val target = Files.createTempDirectory("lease_none_streak").toString
    val fs = fsOf(target)
    MutationLease.degradedTargets.remove(target)
    val staleMs = 400L // heartbeat period ~133 ms
    intercept[IllegalStateException] {
      MutationLease.withLease(spark, target, staleMs = staleMs) {
        // an external actor deletes the lease mid-mutation and nothing
        // replaces it: every renewal reads None from here on
        fs.delete(leaseOf(target), false)
        Thread.sleep(staleMs * 3) // streak × period crosses staleMs
      }
    } // release reads <gone> → loud, as before
    assert(MutationLease.degradedTargets.containsKey(target),
      "a None streak longer than staleMs must surface via degrade()")
  }

  test("release on success, on failure, and across re-entry") {
    val target = Files.createTempDirectory("lease_release").toString
    val fs = fsOf(target)

    // re-entry: a scrub nested inside a merge re-enters its own hold,
    // and the lease exists exactly while the outermost hold is live
    val r = MutationLease.withLease(spark, target) {
      assert(fs.exists(leaseOf(target)), "held during the body")
      MutationLease.withLease(spark, target) { 42 }
    }
    assert(r == 42)
    assert(!fs.exists(leaseOf(target)), "released after success")

    intercept[RuntimeException] {
      MutationLease.withLease(spark, target) {
        throw new RuntimeException("mutation failed")
      }
    }
    assert(!fs.exists(leaseOf(target)),
      "a failed mutation must not leave the target wedged")
  }
}
