package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.Reporter
import org.scalatest.events._

/** Writes a one-line JSON test summary to `test_out.json` (repo root — the
  * forked test JVM's working directory is the sbt base directory).
  *
  * VERDICT r5 item 9: Bench and Verify leave durable artifacts
  * (`bench_out.json`, `verify_summary.json`) but a red `sbt test` was only
  * visible in the build log, which the driver's snapshot truncates. This
  * reporter makes the suite's state a file: it rewrites the summary after
  * EVERY test event, so even a run that dies mid-suite (OOM, timeout) leaves
  * an honest partial count rather than a stale green file, and the final
  * write reflects the full run without depending on RunCompleted being
  * fired by the sbt/ScalaTest bridge.
  *
  * Wired via `Test / testOptions += Tests.Argument(..., "-C", ...)` in
  * build.sbt. Suites can run in parallel inside the one forked JVM, so all
  * mutation is under a lock; the file lands atomically (temp + move) so a
  * reader never sees a torn line.
  */
class JsonSummaryReporter extends Reporter {
  private[this] val lock = new Object
  private[this] var passed = 0
  private[this] var failed = 0
  private[this] var ignored = 0
  private[this] var pending = 0
  private[this] var canceled = 0
  private[this] var suitesAborted = 0
  private[this] var runDone = false
  private[this] val failedNames = scala.collection.mutable.ArrayBuffer.empty[String]

  override def apply(event: Event): Unit = lock.synchronized {
    event match {
      case _: TestSucceeded => passed += 1
      case e: TestFailed =>
        failed += 1
        failedNames += s"${e.suiteName}: ${e.testName}"
      case _: TestIgnored  => ignored += 1
      case _: TestPending  => pending += 1
      case _: TestCanceled => canceled += 1
      case e: SuiteAborted =>
        suitesAborted += 1
        failedNames += s"${e.suiteName}: <suite aborted>"
      case _: RunCompleted => runDone = true
      case _               => ()
    }
    write()
  }

  private[this] def esc(s: String): String =
    s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    }

  private[this] def write(): Unit = {
    val green = failed == 0 && suitesAborted == 0
    val names = failedNames.take(20).map(n => s""""${esc(n)}"""").mkString(",")
    val line =
      s"""{"green":$green,"run_completed":$runDone,"tests_passed":$passed,""" +
        s""""tests_failed":$failed,"tests_ignored":$ignored,"tests_pending":$pending,""" +
        s""""tests_canceled":$canceled,"suites_aborted":$suitesAborted,"failed_names":[$names]}""" + "\n"
    val tmp = Paths.get("test_out.json.tmp")
    Files.write(tmp, line.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get("test_out.json"), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
