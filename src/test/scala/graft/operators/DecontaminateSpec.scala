package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val bench = Seq(
    (100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")

  private lazy val corpus = Seq(
    // shares the 5-grams "alpha beta gamma delta epsilon" and
    // "beta gamma delta epsilon zeta" with the bench doc
    (0L, "prefix alpha beta gamma delta epsilon zeta suffix"),
    // shares words but never 5 contiguous ones
    (1L, "alpha beta gamma xxx delta epsilon zeta alpha beta"),
    // unrelated
    (2L, "one two three four five six seven"),
    // too short for any 5-gram
    (3L, "alpha beta")).toDF("doc_id", "text")

  test("flag: exact 5-gram collisions only, with distinct-gram hit counts") {
    val out = Decontaminate.flag(corpus, bench, n = 5)
      .as[(Long, Long, Boolean)].collect()
      .map { case (d, h, c) => d -> ((h, c)) }.toMap
    assert(out(0L) == (2L, true))
    assert(out(1L) == (0L, false))
    assert(out(2L) == (0L, false))
    assert(out(3L) == (0L, false))
  }

  test("hit count is over DISTINCT shared grams (repeats in the doc count once)") {
    val rep = Seq((0L, "alpha beta gamma delta epsilon x alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val out = Decontaminate.flag(rep, bench, n = 5)
      .as[(Long, Long, Boolean)].collect().head
    assert(out == ((0L, 1L, true)))
  }

  test("the bench-gram side is broadcast (no shuffle of the corpus text)") {
    val plan = Decontaminate
      .contaminationHits(corpus, bench, n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  // ---- fuzzy (near-dup) decontamination ----

  // 30 tokens: a single-token edit leaves 25 of 28+3 3-gram shingles
  // shared (jaccard ~0.81) — high enough that the 4x4 LSH banding
  // deterministically lands a band collision
  private val benchText = (1 to 30).map(i => s"tok$i").mkString(" ")

  private lazy val fuzzyBench = Seq((100L, benchText)).toDF("doc_id", "text")

  private lazy val fuzzyCorpus = Seq(
    (0L, benchText),                                    // verbatim copy
    (1L, benchText.replace("tok30", "EDITED")),         // near copy (1 token edited)
    (2L, "one two three four five six seven eight"),    // unrelated
    (100L, benchText))                                   // the bench doc ITSELF
    .toDF("doc_id", "text")

  test("clusterFlag: a paraphrased leak is caught VIA its cluster, not its own n-grams") {
    val evalSentence = (1 to 15).map(i => s"e$i").mkString(" ")
    val filler = (1 to 30).map(i => s"f$i").mkString(" ")
    val evalBench = Seq((900L, evalSentence)).toDF("doc_id", "text")
    // A leaks the eval sentence verbatim; B is A with the MIDDLE eval
    // token swapped — every 8-gram of the leaked span dies, but B stays
    // a near-duplicate of A; C is clean and unrelated
    val docs = Seq(
      (1L, s"$filler $evalSentence"),
      (2L, s"$filler ${evalSentence.replace("e8", "paraphrased")}"),
      (3L, (1 to 45).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = Dedup.nearDupsMinhash(docs, threshold = 0.3).select($"a_id", $"b_id")
    val got = Decontaminate.clusterFlag(docs, evalBench, pairs, n = 8)
      .select($"doc_id", $"self_hit", $"cluster_hit", $"keep")
      .as[(Long, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((true, true, false)))   // direct leak
    assert(got(2L) === ((false, true, false)))  // clean 8-grams, poisoned cluster
    assert(got(3L) === ((false, false, true)))  // clean doc, clean cluster
  }

  test("fuzzyFlag: verbatim copy flags at jaccard 1.0; near copy above threshold") {
    val out = Decontaminate.fuzzyFlag(fuzzyCorpus, fuzzyBench, threshold = 0.3)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), r.getBoolean(3)))).toMap
    assert(out(0L) == ((Some(1.0), Some(100L), true)))
    val (nearJ, nearB, nearC) = out(1L)
    assert(nearC && nearB == Some(100L) && nearJ.exists(_.asInstanceOf[Double] >= 0.3))
    assert(out(2L) == ((None, None, false)))
  }

  test("fuzzyFlag: a doc never matches ITSELF in the benchmark (replay lesson)") {
    // doc 100 appears in both corpus and bench with the same id: its only
    // candidate is itself, which the id filter removes
    val r = Decontaminate.fuzzyFlag(fuzzyCorpus, fuzzyBench, threshold = 0.3)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 100L).collect().head
    assert(!r.getBoolean(3))
  }

  test("fuzzyFlag: sharedIdSpace=false treats equal ids as a coincidence, not identity") {
    // the benchmark has its OWN id space: corpus doc 100 and bench item
    // 100 are different things that happen to share a number — the hit
    // must NOT be suppressed
    val r = Decontaminate.fuzzyFlag(fuzzyCorpus, fuzzyBench, threshold = 0.3,
        sharedIdSpace = false)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 100L).collect().head
    assert(r.getBoolean(3) && r.getDouble(1) == 1.0)
  }

  test("fuzzyFlag: ties on max_jaccard resolve to the smallest bench id") {
    val twoBench = Seq((200L, benchText), (50L, benchText)).toDF("doc_id", "text")
    val r = Decontaminate.fuzzyFlag(fuzzyCorpus.filter(
        org.apache.spark.sql.functions.col("doc_id") === 0L),
        twoBench, threshold = 0.3).collect().head
    assert(r.getLong(2) == 50L && r.getDouble(1) == 1.0)
  }

  test("fuzzyFlag: benchIsSubset reuses corpus signatures with identical results") {
    // fuzzyBench's doc 100 IS fuzzyCorpus's doc 100, so the subset fast
    // path applies and must be decision-identical to the recompute path
    val slow = Decontaminate.fuzzyFlag(fuzzyCorpus, fuzzyBench, threshold = 0.3)
      .orderBy(org.apache.spark.sql.functions.col("doc_id")).collect().toSeq
    val fast = Decontaminate.fuzzyFlag(fuzzyCorpus, fuzzyBench, threshold = 0.3,
        benchIsSubset = true)
      .orderBy(org.apache.spark.sql.functions.col("doc_id")).collect().toSeq
    assert(fast == slow)
  }

  test("fuzzyFlag: benchIsSubset contract violations fail loudly") {
    // subset mode without a shared id space is meaningless
    intercept[IllegalArgumentException] {
      Decontaminate.fuzzyFlag(fuzzyCorpus, fuzzyBench, threshold = 0.3,
        sharedIdSpace = false, benchIsSubset = true)
    }
    // a bench id missing from the corpus must not silently drop the item
    val strayBench = fuzzyBench.union(
      Seq((999L, "never in the corpus at all here")).toDF("doc_id", "text"))
    val e = intercept[IllegalArgumentException] {
      Decontaminate.fuzzyFlag(fuzzyCorpus, strayBench, threshold = 0.3,
        benchIsSubset = true)
    }
    assert(e.getMessage.contains("not in the corpus"))
  }

  test("fuzzyFlag: bench side is broadcast in both funnel stages") {
    val plan = Decontaminate.fuzzyFlag(fuzzyCorpus, fuzzyBench, threshold = 0.3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  // ---- surgical span scrubbing ----

  test("scrubSpans: removes exactly the covered tokens, keeps the rest") {
    // bench "alpha..zeta" (6 tokens) has two 5-grams; the corpus doc
    // hits both at starts {1, 2}, covering tokens 1..6 of 8 — only
    // "prefix" and "suffix" survive
    val out = Decontaminate.scrubSpans(corpus, bench, n = 5)
      .orderBy(org.apache.spark.sql.functions.col("doc_id")).collect()
    val d0 = out(0)
    assert(d0.getAs[Long]("n_spans") == 2L)
    assert(d0.getAs[Long]("n_tokens_removed") == 6L)
    assert(d0.getAs[Boolean]("contaminated"))
    assert(d0.getAs[String]("clean_md5") == md5Hex("prefix suffix"))
    // word-overlap-only, unrelated, and sub-gram docs keep everything
    Seq(1, 2, 3).foreach { i =>
      assert(out(i).getAs[Long]("n_spans") == 0L)
      assert(out(i).getAs[Long]("n_tokens_removed") == 0L)
      assert(!out(i).getAs[Boolean]("contaminated"))
    }
    assert(out(1).getAs[String]("clean_md5") ==
      md5Hex("alpha beta gamma xxx delta epsilon zeta alpha beta"))
  }

  test("scrubSpans: a repeated benchmark phrase is removed at EVERY site") {
    val rep = Seq((0L,
      "alpha beta gamma delta epsilon x alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val r = Decontaminate.scrubSpans(rep, bench, n = 5).collect().head
    // hits at starts 0 and 6 cover tokens 0..4 and 6..10: only "x" survives
    assert(r.getAs[Long]("n_spans") == 2L)
    assert(r.getAs[Long]("n_tokens_removed") == 10L)
    assert(r.getAs[String]("clean_md5") == md5Hex("x"))
  }

  test("scrubSpans: a benchmark doc in the corpus scrubs to nothing") {
    val withBench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val r = Decontaminate.scrubSpans(withBench, bench, n = 5).collect().head
    assert(r.getAs[Long]("n_tokens_removed") == 6L)
    assert(r.getAs[String]("clean_md5") == md5Hex(""))
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("fuzzyFlag: parameter contracts fail loudly") {
    intercept[IllegalArgumentException] {
      Decontaminate.fuzzyFlag(fuzzyCorpus, fuzzyBench, threshold = 0.0)
    }
    intercept[IllegalArgumentException] {
      Decontaminate.fuzzyFlag(fuzzyCorpus, fuzzyBench, threshold = 0.5,
        numHashes = 16, bands = 5)
    }
  }
}
