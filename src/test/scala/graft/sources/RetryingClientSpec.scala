package graft.sources.odata

import org.scalatest.funsuite.AnyFunSuite

/** The retry/throttle behavior the reference's live CI exercises against
  * CBS, certified offline: a flaky client that throws once (HTTP 429) and
  * succeeds on retry, a 404 that must NOT be retried, and a permanently
  * failing fetch that surfaces its error after the bounded attempts.
  */
class RetryingClientSpec extends AnyFunSuite {

  /** Throws on the first `failures` calls per url, then delegates. */
  private class Flaky(inner: StatlineClient, failures: Int) extends StatlineClient {
    val calls = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    override def get(url: String): Option[String] = {
      calls(url) += 1
      if (calls(url) <= failures) throw new java.io.IOException(s"HTTP 429 for $url")
      inner.get(url)
    }
  }

  private def retrying(inner: StatlineClient): (RetryingClient, () => Seq[Long]) = {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val c = RetryingClient(inner, maxRetries = 3, baseDelayMs = 100)
    c.sleep = slept += _
    (c, () => slept.toSeq)
  }

  test("a page that 429s once succeeds on retry with one backoff sleep") {
    val flaky = new Flaky(ReplayClient(Map("u" -> "payload")), failures = 1)
    val (c, slept) = retrying(flaky)
    assert(c.get("u").contains("payload"))
    assert(flaky.calls("u") == 2)
    assert(slept() == Seq(100L))
  }

  test("404 is a value, not a failure: absent resource is never retried") {
    val inner = new Flaky(ReplayClient(Map.empty), failures = 0)
    val (c, slept) = retrying(inner)
    assert(c.get("missing").isEmpty)
    assert(inner.calls("missing") == 1)
    assert(slept().isEmpty)
  }

  test("a permanently failing fetch surfaces after bounded exponential attempts") {
    val flaky = new Flaky(ReplayClient(Map("u" -> "x")), failures = Int.MaxValue)
    val (c, slept) = retrying(flaky)
    val e = intercept[java.io.IOException](c.get("u"))
    assert(e.getMessage.contains("429"))
    assert(flaky.calls("u") == 4) // 1 + maxRetries, never infinite
    assert(slept() == Seq(100L, 200L, 400L)) // deterministic doubling
  }
}
