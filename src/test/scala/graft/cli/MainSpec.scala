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
}
