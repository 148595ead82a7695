package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UrlFilterSpec extends SparkTestBase {

  import spark.implicits._

  private def block(domains: String*) = domains.toDF("domain")

  test("domainSuffixes: full label-suffix chain, longest first") {
    val got = Seq("a.b.c.d").toDF("h")
      .select(UrlFilter.domainSuffixes($"h").as("s"))
      .head().getSeq[String](0)
    assert(got === Seq("a.b.c.d", "b.c.d", "c.d"))
  }

  test("domainSuffixes: one-label host yields itself") {
    val got = Seq("localhost").toDF("h")
      .select(UrlFilter.domainSuffixes($"h").as("s"))
      .head().getSeq[String](0)
    assert(got === Seq("localhost"))
  }

  test("blocklist kills exact host and parent suffix, but only at label boundaries") {
    val docs = Seq(
      (1L, "https://ads.example.net/x"),      // exact hit
      (2L, "https://cdn.ads.example.net/x"),  // parent-suffix hit
      (3L, "https://notads.example.net/x"),   // 'ads.example.net' is NOT a label suffix
      (4L, "https://example.net/x"),          // parent of the rule — NOT blocked
      (5L, "https://clean.example.org/x")
    ).toDF("doc_id", "url")
    val got = UrlFilter.applyBlocklist(docs, block("ads.example.net"), Seq.empty)
      .select($"doc_id", $"blocked", $"reason").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), Option(r.getString(2)))).toMap
    assert(got(1L) === (true, Some("domain")))
    assert(got(2L) === (true, Some("domain")))
    assert(got(3L) === (false, None))
    assert(got(4L) === (false, None))
    assert(got(5L) === (false, None))
  }

  test("path keyword blocks; domain reason wins over path") {
    val docs = Seq(
      (1L, "https://ok.example.org/casino/1"),       // path only
      (2L, "https://spam.bad.test/casino/2"),        // both -> domain wins
      (3L, "https://ok.example.org/forum/casino-free"), // substring of path, no slash-bounded hit
      (4L, "https://ok.example.org/p/4")
    ).toDF("doc_id", "url")
    val got = UrlFilter.applyBlocklist(docs, block("bad.test"), Seq("/casino/"))
      .select($"doc_id", $"blocked", $"reason").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), Option(r.getString(2)))).toMap
    assert(got(1L) === (true, Some("path")))
    assert(got(2L) === (true, Some("domain")))
    assert(got(3L) === (false, None))
    assert(got(4L) === (false, None))
  }

  test("blocklist join is broadcast (corpus side never shuffles for the lookup)") {
    val docs = Seq((1L, "https://a.b.c/x")).toDF("doc_id", "url")
    val plan = UrlFilter.applyBlocklist(docs, block("b.c"), Seq.empty)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast semi join in:\n$plan")
  }
}
