package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class SubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val w = (1 to 20).map(i => s"w$i")
  private lazy val docs = Seq(
    // doc 1: 20 tokens -> 11 distinct 10-token windows
    (1L, w.mkString(" ")),
    // doc 2: 18 tokens; positions 6..15 are doc 1's w5..w14 -> exactly
    // one window (start 6) reproduces a doc-1 window verbatim
    (2L, ((1 to 5).map(i => s"x$i") ++ w.slice(4, 14) ++ (1 to 3).map(i => s"y$i")).mkString(" ")),
    // doc 3: unrelated 20 tokens
    (3L, (1 to 20).map(i => s"z$i").mkString(" ")),
    // doc 4: exact copy of doc 1 -> every window shared, all owned earlier
    (4L, w.mkString(" ")),
    // doc 5: shorter than the window -> no windows at all
    (5L, "a b c"))
    .toDF("doc_id", "text")

  test("substringDupStats: exact shared-window census with first-owner attribution") {
    val out = Dedup.substringDupStats(docs, k = 10).orderBy($"doc_id").collect()
    // doc 1 is the first owner of its windows: shared with 2 and 4, never "before"
    assert(out(0) == Row(1L, 11L, 11L, 0L, 1.0))
    assert(out(1) == Row(2L, 9L, 1L, 1L, math.rint(1.0 / 9 * 1e6) / 1e6))
    assert(out(2) == Row(3L, 11L, 0L, 0L, 0.0))
    assert(out(3) == Row(4L, 11L, 11L, 11L, 1.0))
    assert(out(4) == Row(5L, 0L, 0L, 0L, null))
  }

  test("substringScrub: first owner untouched, exact copy erased, partial overlap cut token-exact") {
    val out = Dedup.substringScrub(docs, k = 10).orderBy($"doc_id")
      .select("doc_id", "n_spans", "n_tokens_removed", "clean_md5", "scrubbed")
      .as[(Long, Long, Long, String, Boolean)].collect()
    def md5Of(s: String) =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // doc 1 owns every window it shares — nothing removed
    assert(out(0) == ((1L, 0L, 0L, md5Of(w.mkString(" ")), false)))
    // doc 2: one shared window at token positions 5..14 (0-based) — 10 tokens cut
    val doc2Kept = ((1 to 5).map(i => s"x$i") ++ (1 to 3).map(i => s"y$i")).mkString(" ")
    assert(out(1) == ((2L, 1L, 10L, md5Of(doc2Kept), true)))
    // doc 3: no shared windows
    assert(out(2)._2 == 0L && !out(2)._5)
    // doc 4: exact copy of doc 1 — every position covered, doc erased
    assert(out(3) == ((4L, 11L, 20L, md5Of(""), true)))
    // doc 5: shorter than the window — untouched
    assert(out(4) == ((5L, 0L, 0L, md5Of("a b c"), false)))
  }

  test("substringScrub agrees with the census: scrubbed iff n_dup_before > 0") {
    val census = Dedup.substringDupStats(docs, k = 10)
      .select($"doc_id", ($"n_dup_before" > 0).as("expect"))
    val scrub = Dedup.substringScrub(docs, k = 10).select($"doc_id", $"scrubbed")
    val joined = census.join(scrub, "doc_id")
      .filter($"expect" =!= $"scrubbed").count()
    assert(joined == 0L)
  }

  test("substringDupStats: no pair materialization — linear explode + two shuffles") {
    val plan = Dedup.substringDupStats(docs, k = 10)
      .queryExecution.optimizedPlan.toString
    // the linear shape: no self-join of the corpus against itself on ids
    assert(!plan.contains("a_id") && !plan.contains("b_id"))
  }
}
