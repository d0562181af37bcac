package graft.cli

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** CLI `.env` self-loading (reference parity with `set -a; source
  * .env` in run_holders_and_report.sh:4) — pure parsing, no session.
  */
class MainSpec extends AnyFunSuite {

  test("parseDotEnv: KEY=VALUE lines, comments, export prefix, quotes") {
    val f = Files.createTempFile("graft", ".env").toFile
    Files.writeString(f.toPath,
      """# reference .env contract
        |MERLINSCAN_API_KEY=abc123
        |export GRAFT_DATA_ROOT=/tmp/data
        |ETL_RATE_LIMIT_QPS="2.5"
        |TELEGRAM_BOT_TOKEN='tok:en'
        |
        |BROKEN_LINE_NO_EQUALS
        |=NO_KEY
        |SPACED = padded value
        |""".stripMargin)
    val env = Main.parseDotEnv(f)
    assert(env == Map(
      "MERLINSCAN_API_KEY" -> "abc123",
      "GRAFT_DATA_ROOT" -> "/tmp/data",
      "ETL_RATE_LIMIT_QPS" -> "2.5",
      "TELEGRAM_BOT_TOKEN" -> "tok:en",
      "SPACED" -> "padded value"))
  }

  test("parseDotEnv: missing file is an empty contract, not an error") {
    assert(Main.parseDotEnv(new java.io.File("/nonexistent/.env")).isEmpty)
  }

  test("withTimeout: expiry cancels jobs and fails; completion passes through") {
    var cancelled = false
    val e = intercept[RuntimeException] {
      Main.withTimeout(Some(1L), () => cancelled = true) { Thread.sleep(60000); 1 }
    }
    assert(e.getMessage.contains("timed out after 1s") && cancelled)
    assert(Main.withTimeout(Some(60L), () => fail("must not cancel")) { 42 } == 42)
    assert(Main.withTimeout(None, () => fail("must not cancel")) { 7 } == 7)
    // a body failure surfaces as the original exception, not wrapped
    val boom = intercept[IllegalStateException] {
      Main.withTimeout(Some(60L), () => ())(throw new IllegalStateException("boom"))
    }
    assert(boom.getMessage == "boom")
  }

  test("withFileLock: a concurrent second invocation skips cleanly without interleaving writes") {
    val lock = Files.createTempFile("graft", ".lock").toString
    val log = Files.createTempFile("graft", ".writes")
    val started = new java.util.concurrent.CountDownLatch(1)
    val finish = new java.util.concurrent.CountDownLatch(1)

    // invocation A holds the lock mid-"ingest"
    val a = new Thread(() => {
      Main.withFileLock(Some(lock)) {
        Files.writeString(log, "A-start;", java.nio.file.StandardOpenOption.APPEND)
        started.countDown()
        finish.await()
        Files.writeString(log, "A-end;", java.nio.file.StandardOpenOption.APPEND)
      }
    })
    a.start()
    started.await()

    // invocation B (same token → same lock file) must SKIP — None, no
    // body execution, no write between A's writes
    val b = Main.withFileLock(Some(lock)) {
      Files.writeString(log, "B;", java.nio.file.StandardOpenOption.APPEND)
      "ran"
    }
    assert(b.isEmpty, "second concurrent invocation must skip, not run or block")

    finish.countDown()
    a.join()
    assert(Files.readString(log) == "A-start;A-end;",
      "the loser must leave no writes interleaved with the holder's")

    // after release, the next run acquires normally
    assert(Main.withFileLock(Some(lock)) { 42 }.contains(42))
    // and no lock file → no gating
    assert(Main.withFileLock(None) { 7 }.contains(7))
  }
}
