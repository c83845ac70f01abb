package graft.sources

/** Bounded wait-and-retry for SCRUB-side lease contention (the r14
  * follow-through on [[MutationLease]]'s fail-loud posture): a takedown
  * scrub that arrives while an ingest merge or a cell-carry build holds
  * the target's lease used to fail immediately — correct (erasure
  * pipelines re-run on failure, every scrub leg is replay-idempotent)
  * but operationally noisy, because the common collision is a SHORT
  * build that releases within seconds. The retry POLICY lives here with
  * the scrub callers, not in the lease: builds and merges keep failing
  * loudly (their callers own the decision), while erasure legs wait out
  * a live holder for a bounded window before re-raising.
  *
  * Retries ONLY [[MutationLease.LeaseContended]] — live contention. A
  * STOLEN lease (the body outlived its stale window and another writer
  * may have interleaved) and every other failure propagate immediately:
  * re-running over possibly-corrupted state is exactly what the loud
  * failure exists to prevent.
  *
  * **The bounded-wait promise holds CROSS-PROCESS only** (r14 ADVICE):
  * `LeaseContended` is thrown for a foreign process's on-disk lease,
  * but contention from another THREAD in this JVM blocks on the Hold
  * monitor inside `withLease` before the lease is ever examined — a
  * scrub queued behind a long in-JVM compaction waits on that monitor
  * for the compaction's full duration, not the retry budget. That is
  * the intended posture (in-JVM callers share a scheduler and a fate;
  * the budget exists to avoid camping on a FOREIGN holder's unknown
  * timeline), but callers wanting a hard wall-clock bound must enforce
  * it around the whole scrub invocation, not rely on this budget.
  */
private[graft] object ScrubRetry {

  /** Run `body`, retrying on live lease contention with doubling
    * backoff (capped at [[MaxBackoffMs]]); after `attempts` failures
    * re-throw with the last contention as cause. The body must be
    * idempotent — every scrub leg already is (replay-idempotence is
    * each leg's documented contract). */
  def retryContended[T](what: String, attempts: Int = DefaultAttempts,
                        backoffMs: Long = DefaultBackoffMs)(body: => T): T = {
    require(attempts >= 1, s"attempts must be >= 1: $attempts")
    var left = attempts
    var wait = backoffMs
    while (true) {
      try return body
      catch {
        case e: MutationLease.LeaseContended =>
          left -= 1
          if (left <= 0) throw new IllegalStateException(
            s"$what: target still lease-contended after $attempts " +
              "attempts — the holder outlived the scrub's retry budget; " +
              "re-run the erasure pass after it completes", e)
          Thread.sleep(wait)
          wait = math.min(wait * 2, MaxBackoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Six attempts at 500 ms doubling (cap 8 s) ≈ a 15 s window —
    * enough for micro-batch merges and small carry builds to release,
    * far below the lease's own 15 min stale window so a retry loop can
    * never be mistaken for a crashed holder. */
  val DefaultAttempts: Int = 6
  val DefaultBackoffMs: Long = 500L
  val MaxBackoffMs: Long = 8000L
}
