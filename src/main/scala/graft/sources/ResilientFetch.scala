package graft.sources

import org.apache.spark.sql.{Dataset, Encoder}

/** Executor-side resilience for the live Hub connector (SURVEY §3 E1;
  * the reference serializes its crawl and dies on the first API error —
  * databaseImport.py's per-repo loops have no retry/backoff at all).
  * This is the drop-in layer a real `HfhSource` runs its HTTP calls
  * through, unit-testable without a network because clock, sleep, and
  * the fetch function are all injected.
  *
  * Semantics, mirroring the governance plane (F3/F8):
  *  - **rate limit**: one token-bucket per partition. Callers divide
  *    the global budget by the number of concurrent partitions
  *    (`globalRps / numPartitions`) — limiter state can't be shared
  *    across executors, so the per-partition budget IS the contract.
  *  - **retry**: bounded exponential backoff on RETRYABLE failures
  *    only (IO errors, HTTP 429/5xx). Client errors (4xx) fail fast —
  *    retrying a 404 burns budget and masks real drift.
  *  - **quarantine**: a repo that exhausts retries becomes an error
  *    OUTCOME row, not a task failure — one dead repo must not kill a
  *    million-repo crawl. Splitting outcomes into fetched/quarantined
  *    frames is a filter, exactly like Governance.quarantine.
  */
object ResilientFetch {

  /** thrown (or wrapped) by clients to surface HTTP status codes */
  final case class HttpStatusException(status: Int, detail: String = "")
    extends RuntimeException(s"HTTP $status $detail")

  /** 429 and 5xx are transient; IO/timeout errors are transient; other
    * status codes and everything else fail fast */
  def retryable(t: Throwable): Boolean = t match {
    case HttpStatusException(s, _) => s == 429 || s >= 500
    case _: java.io.IOException    => true
    case _                         => false
  }

  final case class Policy(maxAttempts: Int = 4,
                          baseDelayMs: Long = 250,
                          maxDelayMs: Long = 8000,
                          perPartitionRps: Double = 5.0) {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    require(perPartitionRps > 0, s"perPartitionRps must be positive, got $perPartitionRps")
    /** exponential, capped: 250, 500, 1000, ... ms */
    def delayMs(attempt: Int): Long =
      math.min(maxDelayMs, baseDelayMs * (1L << math.min(attempt - 1, 20)))
  }

  /** one fetch's outcome: `value` xor `error`; `attempts` for observability */
  final case class Outcome[A](key: String, attempts: Int,
                              value: Option[A], error: Option[String]) {
    def quarantined: Boolean = error.isDefined
  }

  /** Token bucket with injected time/sleep (pass real
    * `System.nanoTime`/`Thread.sleep` in production, recorders in
    * tests). Capacity one second of tokens, so a cold start can burst
    * at most `rps` calls. */
  final class RateLimiter(rps: Double, nanoTime: () => Long, sleepMs: Long => Unit) {
    private val capacity = math.max(1.0, rps)
    private var tokens = capacity
    private var last = nanoTime()
    def acquire(): Unit = {
      val now = nanoTime()
      tokens = math.min(capacity, tokens + (now - last) / 1e9 * rps)
      last = now
      if (tokens < 1.0) {
        val waitMs = math.ceil((1.0 - tokens) / rps * 1000).toLong
        sleepMs(waitMs)
        tokens += waitMs / 1000.0 * rps
        last = nanoTime()
      }
      tokens -= 1.0
    }
  }

  /** retry loop around one fetch; never throws (terminal failures
    * become error outcomes) */
  def fetchOne[A](key: String, fetch: String => A, policy: Policy,
                  limiter: RateLimiter, sleepMs: Long => Unit): Outcome[A] = {
    var attempt = 0
    var lastError: Throwable = null
    while (attempt < policy.maxAttempts) {
      attempt += 1
      limiter.acquire()
      try return Outcome(key, attempt, Some(fetch(key)), None)
      catch {
        case t: Throwable if retryable(t) && attempt < policy.maxAttempts =>
          lastError = t
          sleepMs(policy.delayMs(attempt))
        case t: Throwable =>
          return Outcome(key, attempt, None,
            Some(t.getClass.getSimpleName + ": " +
              Option(t.getMessage).getOrElse("").take(500)))
      }
    }
    Outcome(key, attempt, None, // unreachable: loop exits via returns
      Some(Option(lastError).map(_.toString).getOrElse("exhausted")))
  }

  /** sequential drive of one partition's keys through limiter+retry */
  def fetchAll[A](keys: Iterator[String], fetch: String => A, policy: Policy,
                  limiter: RateLimiter,
                  sleepMs: Long => Unit = Thread.sleep): Iterator[Outcome[A]] =
    keys.map(fetchOne(_, fetch, policy, limiter, sleepMs))

  /** Distributed form: each partition gets its own limiter at
    * `policy.perPartitionRps`, outcomes come back as a Dataset to
    * split into bronze (value) and quarantine (error) frames. `fetch`
    * must be serializable — it IS the live client. */
  def fetchDataset[A](keys: Dataset[String], fetch: String => A, policy: Policy)
                     (implicit enc: Encoder[Outcome[A]]): Dataset[Outcome[A]] =
    keys.mapPartitions { it =>
      val limiter = new RateLimiter(policy.perPartitionRps, () => System.nanoTime(), Thread.sleep)
      fetchAll(it, fetch, policy, limiter)
    }
}
