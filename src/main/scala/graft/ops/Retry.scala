package graft.ops

/** Function-level retry with capped exponential backoff (ref
  * core/retry.py:17 `retry_with_backoff`, :92 `RetryConfig`).
  *
  * Driver/edge-side plumbing only — Spark TASKS retry through the
  * scheduler, never through this. The seam it protects is the same one
  * the reference protects: connector calls (REST fetches, JDBC probes,
  * catalog lookups) made OUTSIDE a task, where one flaky TCP reset
  * should not kill a pipeline run.
  *
  * The two non-deterministic edges — the clock sleep and the jitter
  * draw — are injectable, so specs drive the schedule with a recording
  * sleep and a constant jitter and assert the exact delay sequence.
  */
object Retry {

  /** core/exceptions `RetryExhaustedError`: carries the attempt count
    * and the final failure as the cause. Lives in the [[Errors]]
    * hierarchy (r16); these aliases keep every existing call/catch
    * site source-compatible. */
  type RetryExhausted = Errors.RetryExhaustedError
  val RetryExhausted = Errors.RetryExhaustedError

  /** retry.py:17. Delays: d₁ = initial, dₙ₊₁ = min(dₙ·factor, max);
    * each actual sleep is dₙ·(1 + jitter()) capped at max (jitter ∈
    * [0,1) spreads synchronized retry storms; pass `() => 0.0` for a
    * deterministic schedule). `retryOn` bounds WHAT retries — a 404
    * should fail fast while a 503 backs off; default retries any
    * non-fatal exception. */
  def withBackoff[T](
      maxAttempts: Int = 3,
      initialDelayMs: Long = 1000L,
      backoffFactor: Double = 2.0,
      maxDelayMs: Long = 60000L,
      retryOn: Throwable => Boolean = _ => true,
      jitter: () => Double = () => scala.util.Random.nextDouble(),
      sleep: Long => Unit = Thread.sleep)(f: () => T): T = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    require(initialDelayMs >= 0 && maxDelayMs >= 0, "delays must be non-negative")
    require(backoffFactor >= 1.0, s"backoffFactor must be >= 1.0, got $backoffFactor")
    var delay = initialDelayMs
    var attempt = 1
    while (true) {
      try return f()
      catch {
        case scala.util.control.NonFatal(e) if retryOn(e) =>
          if (attempt == maxAttempts) throw RetryExhausted(maxAttempts, e)
          val actual = math.min((delay * (1.0 + jitter())).toLong, maxDelayMs)
          sleep(actual)
          delay = math.min((delay * backoffFactor).toLong, maxDelayMs)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** retry.py:92 RetryConfig as a value: pre-bound policy, reusable
    * across call sites. [[graft.sources.Settings.ConnectorSettings]]
    * renders to one via [[Policy.fromConnectorSettings]]. */
  final case class Policy(
      maxAttempts: Int = 3,
      initialDelayMs: Long = 1000L,
      backoffFactor: Double = 2.0,
      maxDelayMs: Long = 60000L,
      retryOn: Throwable => Boolean = _ => true,
      jitter: () => Double = () => scala.util.Random.nextDouble(),
      sleep: Long => Unit = Thread.sleep) {
    def execute[T](f: () => T): T =
      withBackoff(maxAttempts, initialDelayMs, backoffFactor, maxDelayMs,
        retryOn, jitter, sleep)(f)
    /** retry.py:138 RetryableOperation: wrap a function so every call
      * retries under this policy. */
    def wrap[A, T](f: A => T): A => T = a => execute(() => f(a))
  }

  object Policy {
    /** The connectors.* settings block as a policy (config.py:294). */
    def fromConnectorSettings(s: graft.sources.Settings.ConnectorSettings): Policy =
      Policy(maxAttempts = s.retryMaxAttempts, backoffFactor = s.retryBackoffFactor)
  }
}
