package graft

import graft.ops.{ResourcePool, Retry}

/** Retry backoff (ref core/retry.py) + ResourcePool (core/resources.py):
  * the two injectable-edge utilities behind connector calls. */
class RetrySpec extends SparkSpec {

  private class Flaky(failures: Int) {
    var calls = 0
    def apply(): String = {
      calls += 1
      if (calls <= failures) throw new RuntimeException(s"boom $calls")
      "ok"
    }
  }

  test("withBackoff: deterministic capped-exponential delay schedule, jitter off") {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val f = new Flaky(3)
    val out = Retry.withBackoff(
      maxAttempts = 5, initialDelayMs = 100, backoffFactor = 2.0, maxDelayMs = 350,
      jitter = () => 0.0, sleep = slept += _)(() => f())
    assert(out == "ok" && f.calls == 4)
    // 100, 200, then 400 capped at 350
    assert(slept.toSeq == Seq(100L, 200L, 350L))
  }

  test("withBackoff: jitter multiplies (1 + j) and stays under the cap") {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val f = new Flaky(2)
    Retry.withBackoff(
      maxAttempts = 3, initialDelayMs = 100, backoffFactor = 2.0, maxDelayMs = 10000,
      jitter = () => 0.5, sleep = slept += _)(() => f())
    assert(slept.toSeq == Seq(150L, 300L)) // 100·1.5, 200·1.5
  }

  test("withBackoff: exhaustion raises RetryExhausted carrying the last error") {
    val f = new Flaky(99)
    val e = intercept[Retry.RetryExhausted] {
      Retry.withBackoff(maxAttempts = 3, sleep = _ => ())(() => f())
    }
    assert(e.attempts == 3 && f.calls == 3)
    assert(e.lastError.getMessage == "boom 3")
  }

  test("withBackoff: retryOn bounds what retries — a non-matching failure fails fast") {
    val f = new Flaky(99)
    val e = intercept[RuntimeException] {
      Retry.withBackoff(
        maxAttempts = 5, sleep = _ => (),
        retryOn = _.getMessage.contains("transient"))(() => f())
    }
    assert(e.getMessage == "boom 1" && f.calls == 1)
  }

  test("Policy: connector settings render to a policy; wrap retries a function edge") {
    val p = Retry.Policy.fromConnectorSettings(
      graft.sources.Settings.ConnectorSettings(retryMaxAttempts = 4, retryBackoffFactor = 3.0))
      .copy(sleep = _ => (), jitter = () => 0.0)
    assert(p.maxAttempts == 4 && p.backoffFactor == 3.0)
    val f = new Flaky(2)
    val wrapped = p.wrap((s: String) => s + f())
    assert(wrapped("x") == "xok" && f.calls == 3)
  }

  test("Rest.retrying: the fetch edge retries under the policy") {
    var calls = 0
    val fetch = (_: String, _: Map[String, String]) => {
      calls += 1
      if (calls < 3) throw new java.io.IOException("reset") else """{"data": []}"""
    }
    val retrying = graft.sources.Rest.retrying(
      fetch, Retry.Policy(maxAttempts = 3, sleep = _ => (), jitter = () => 0.0))
    val pages = graft.sources.Rest.extractPages(
      retrying, "/things", graft.sources.Rest.OffsetPagination(pageSize = 10))
    assert(pages.size == 1 && calls == 3)
  }

  test("ResourcePool: reuse under the cap, close past it, validate out stale resources") {
    var closed = List.empty[Int]
    var built = 0
    val pool = new ResourcePool[Int](
      factory = () => { built += 1; built },
      maxSize = 2, closer = closed ::= _, validate = _ != 2)
    val (a, b, c) = (pool.acquire(), pool.acquire(), pool.acquire())
    assert((a, b, c) == ((1, 2, 3)))
    pool.release(a); pool.release(b) // pool now [2, 1]
    pool.release(c)                  // over cap → closed
    assert(closed == List(3))
    // acquire: 2 fails validation → closed and replaced by 1
    assert(pool.acquire() == 1 && closed == List(2, 3))
    val (created, reused, idle) = pool.stats
    assert(created == 3 && reused == 1 && idle == 0)
  }

  test("ResourcePool: withResource re-pools on success, closes (never re-pools) on failure") {
    var closed = List.empty[Int]
    var built = 0
    val pool = new ResourcePool[Int](() => { built += 1; built }, 4, closed ::= _)
    assert(pool.withResource(_ * 10) == 10)
    assert(pool.stats._3 == 1) // idle again
    // the failure reuses the pooled 1, then closes it — a resource that
    // saw an error may be mid-transaction and must never be handed out
    intercept[RuntimeException](pool.withResource[Int](_ => throw new RuntimeException("tx")))
    assert(closed == List(1) && pool.stats._3 == 0)
    assert(pool.withResource(identity) == 2) // fresh build after the close
    pool.drain()
    assert(closed == List(2, 1) && pool.stats._3 == 0)
  }
}
