package graft.sources

import graft.SparkTestBase

/** Deterministic drive of the retry/rate-limit/quarantine layer: clock,
  * sleep, and fetch are all injected, so every path (backoff schedule,
  * token exhaustion, fail-fast vs retry classification, quarantine
  * rows) is asserted exactly — no timing flake, no network. */
class ResilientFetchSpec extends SparkTestBase {
  import ResilientFetch._

  private def noSleepLimiter = {
    // virtual clock that never advances: the limiter's sleeps are
    // recorded, tokens refill via the post-sleep credit only
    new RateLimiter(1000.0, () => 0L, _ => ())
  }

  test("retry: transient failures back off exponentially, then succeed") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var calls = 0
    val out = fetchOne[String]("k", _ => {
      calls += 1
      if (calls < 3) throw HttpStatusException(503) else "ok"
    }, Policy(maxAttempts = 4, baseDelayMs = 250), noSleepLimiter, sleeps += _)
    assert(out == Outcome("k", 3, Some("ok"), None))
    assert(sleeps.toSeq == Seq(250L, 500L)) // exponential schedule
  }

  test("quarantine: retries exhausted becomes an error outcome, not a throw") {
    var calls = 0
    val out = fetchOne[String]("dead", _ => { calls += 1; throw HttpStatusException(429) },
      Policy(maxAttempts = 3), noSleepLimiter, _ => ())
    assert(calls == 3)
    assert(out.quarantined && out.attempts == 3)
    assert(out.error.get.contains("429"))
  }

  test("fail fast: 4xx and non-IO errors never retry") {
    var calls = 0
    val notFound = fetchOne[String]("gone", _ => { calls += 1; throw HttpStatusException(404) },
      Policy(maxAttempts = 5), noSleepLimiter, _ => ())
    assert(calls == 1 && notFound.quarantined && notFound.error.get.contains("404"))
    calls = 0
    val bug = fetchOne[String]("bug", _ => { calls += 1; throw new IllegalStateException("parse") },
      Policy(maxAttempts = 5), noSleepLimiter, _ => ())
    assert(calls == 1 && bug.quarantined && bug.error.get.contains("IllegalStateException"))
  }

  test("retryable classification: 429/5xx/IO retry; 4xx and others do not") {
    assert(retryable(HttpStatusException(429)))
    assert(retryable(HttpStatusException(500)) && retryable(HttpStatusException(503)))
    assert(retryable(new java.net.SocketTimeoutException("t")))
    assert(!retryable(HttpStatusException(404)) && !retryable(HttpStatusException(400)))
    assert(!retryable(new RuntimeException("x")))
  }

  test("rate limiter: sleeps exactly when the bucket is empty, at 1/rps pace") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    var now = 0L
    val rl = new RateLimiter(2.0, () => now, ms => { sleeps += ms; now += ms * 1000000L })
    rl.acquire(); rl.acquire()          // burst capacity = 2 tokens
    assert(sleeps.isEmpty)
    rl.acquire()                        // empty: must wait 1/rps = 500ms
    assert(sleeps.toSeq == Seq(500L))
    now += 1000L * 1000000L             // 1s passes: 2 tokens refill
    rl.acquire(); rl.acquire()
    assert(sleeps.size == 1)
  }

  test("policy delay schedule caps at maxDelayMs") {
    val p = Policy(maxAttempts = 10, baseDelayMs = 250, maxDelayMs = 2000)
    assert((1 to 6).map(p.delayMs) == Seq(250L, 500L, 1000L, 2000L, 2000L, 2000L))
  }

  test("fetchDataset: per-partition limiter, outcomes split into bronze + quarantine") {
    import spark.implicits._
    val keys = spark.createDataset(Seq("a", "b", "poison", "c")).repartition(2)
    val out = fetchDataset[Int](keys, k => {
      if (k == "poison") throw HttpStatusException(404, "no such repo")
      k.length
    }, Policy(maxAttempts = 2, perPartitionRps = 1e6)).collect()
    val bronze = out.filter(!_.quarantined)
    val quarantined = out.filter(_.quarantined)
    assert(bronze.map(_.key).sorted.toSeq == Seq("a", "b", "c"))
    assert(bronze.forall(o => o.value.contains(o.key.length) && o.attempts == 1))
    assert(quarantined.map(_.key).toSeq == Seq("poison"))
    assert(quarantined.head.error.get.contains("404"))
  }
}
