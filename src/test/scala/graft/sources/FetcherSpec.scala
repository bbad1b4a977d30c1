package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side retry policy (bovada_pull.py:14-42) under a fake
  * clock: 2 s backoff, 60 s deadline, 250-char sanity threshold. */
class FetcherSpec extends AnyFunSuite {

  private class FakeClock(var now: Long = 0L) {
    def apply(): Long = now
    def sleep(ms: Long): Unit = now += ms
  }

  private def scripted(payloads: String*): (Fetcher, () => Int) = {
    var i = 0
    val f = new Fetcher {
      override def fetchOnce(): String = {
        val p = payloads(math.min(i, payloads.length - 1)); i += 1; p
      }
    }
    (f, () => i)
  }

  private val sane = "x" * 250

  test("first sane fetch returns immediately, no sleeps") {
    val clock = new FakeClock
    val (f, calls) = scripted(sane)
    val p = new RetryPolicy(clock = clock.apply _, sleep = clock.sleep)
    assert(p.run(f).contains(sane) && calls() == 1 && clock.now == 0L)
  }

  test("short payloads back off 2s and retry until sane") {
    val clock = new FakeClock
    val (f, calls) = scripted("tiny", "x" * 249, sane)
    val p = new RetryPolicy(clock = clock.apply _, sleep = clock.sleep)
    assert(p.run(f).contains(sane))
    assert(calls() == 3 && clock.now == 4000L) // two 2 s backoffs
  }

  test("gives up with None once 60s elapse (checked after a failed try)") {
    val clock = new FakeClock
    val (f, calls) = scripted("tiny")
    val p = new RetryPolicy(clock = clock.apply _, sleep = clock.sleep)
    assert(p.run(f).isEmpty)
    // 30 backoffs of 2 s reach the 60 s deadline; the 31st attempt
    // fails and the deadline check fires: 31 fetches total
    assert(clock.now == 60000L && calls() == 31)
  }

  test("null payloads count as failed fetches") {
    val clock = new FakeClock
    val (f, _) = scripted(null, sane)
    val p = new RetryPolicy(clock = clock.apply _, sleep = clock.sleep)
    assert(p.run(f).contains(sane) && clock.now == 2000L)
  }
}
