package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md rows that PIN a plan shape must agree with the shape the
  * code actually ships (r14 verdict: the q53 row still described the
  * removed token-major-exchange + df-window plan for a full round —
  * `QueriesSmokeSpec` counts rows, so stale prose passed CI). This spec
  * greps the pinned rows for the keywords their `PlanShapeSpec`/guard
  * counterparts assert, and for the keywords of the shapes they REPLACED,
  * so a future plan change fails here until the doc row moves with it.
  */
class CoverageDriftSpec extends AnyFunSuite {
  private lazy val coverage =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")),
      java.nio.charset.StandardCharsets.UTF_8)

  private def row(marker: String): String =
    coverage.linesIterator.find(_.contains(marker)).getOrElse(
      fail(s"COVERAGE.md row for $marker is gone"))

  test("q53 row matches the shipped row-local-TF plan (no window)") {
    val r = row("oracle q53")
    assert(r.contains("graft_token_counts"), "row must name the native TF expression")
    assert(r.contains("NO Window"), "row must carry the PlanShapeSpec no-window pin")
    assert(!r.contains("df window"), "the removed r13 df-window shape resurfaced in the doc")
  }

  test("q134 row matches the shipped one-aggregate pair stage and +1e9 rekey") {
    val r = row("oracle q134")
    assert(r.contains("+1e9"), "row must carry the r14 rekey offset")
    assert(!r.contains("+1e7) "), "the stale r13 rekey offset resurfaced")
    assert(r.contains("bucket aggregate"), "row must describe the one-aggregate pair stage")
    assert(!r.contains("localCheckpoint'ed"), "the removed checkpoint stage resurfaced in the doc")
  }

  test("q123 row matches the shipped one-pass tagged gram stream") {
    val r = row("oracle q123")
    assert(r.contains("graft_gram_stream"), "row must name the native tagged generator")
    assert(r.contains("ONE corpus pass"), "row must describe the folded single exchange")
  }

  test("q115/q75 rows name the native word-ngram expression") {
    assert(row("oracle q115").contains("graft_word_ngrams"))
    assert(row("oracle q75").contains("graft_word_ngrams"))
  }

  test("q81 row records the measured PostureSessions loop posture") {
    val r = row("q81_recursive_cte")
    assert(r.contains("PostureSessions"))
  }
}
