package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class QualityRulesSpec extends SparkTestBase {
  import spark.implicits._

  // ---- Gopher rules ----

  private lazy val gopherDocs = Seq(
    // 10 words, mean len 32/10 = 3.2, all alpha, stops {the,the,with} = 3
    (1L, "the cat sat on the mat with joy today now"),
    // 5 tokens, mean len 11/5 = 2.2 (too short), alpha 3/5 = 0.6, 0 stops
    (2L, "aa bb cc 123 !!"),
    // 8 words, mean 27/8 = 3.375, all alpha, stops {the,and,the,with} = 4
    (3L, "the dog and the fox run with speed"))
    .toDF("doc_id", "text")

  test("gopherFlags: exact metrics and per-rule booleans") {
    val out = QualityRules.gopherFlags(gopherDocs, minWords = 5L, maxWords = 8L)
      .orderBy($"doc_id").collect()
    assert(out(0) == Row(1L, 10L, 3.2, 1.0, 3L, false, true, true, true, false))
    assert(out(1) == Row(2L, 5L, 2.2, 0.6, 0L, true, false, false, false, false))
    assert(out(2) == Row(3L, 8L, 3.375, 1.0, 4L, true, true, true, true, true))
  }

  test("gopherFlags: uppercase text is lowercased before token probes") {
    val caps = Seq((1L, "THE Dog AND the Fox")).toDF("doc_id", "text")
    val r = QualityRules.gopherFlags(caps, minWords = 1L, maxWords = 10L)
      .select($"n_stop_hits").as[Long].head()
    assert(r == 3L) // the, and, the
  }

  // ---- C4 line filter ----

  private val goodA = "one two three four five."
  private val goodB = "another good line with words."
  private val goodC = "third fine line is here too."

  private lazy val c4Docs = Seq(
    // 3 good lines + 1 short + 1 no-terminal -> kept
    (1L, s"$goodA\ntoo short.\n$goodB\nno terminal punct on this line\n$goodC"),
    // good lines but boilerplate marker
    (2L, s"$goodA\n$goodB\n$goodC\nlorem ipsum filler here."),
    // only 2 surviving lines -> too_few_lines
    (3L, s"$goodA\n$goodB\nshort one."),
    // curly brace -> boilerplate
    (4L, s"$goodA\n$goodB\n$goodC\nif (x) { return; }"),
    // nothing survives -> cleaned text is EMPTY, not null
    (5L, "all\nlines\nare\nshort."))
    .toDF("doc_id", "text")

  test("c4LineFilter: keeps >=5-word terminal-punct lines; census exact") {
    val out = QualityRules.c4LineFilter(c4Docs).orderBy($"doc_id")
      .select($"doc_id", $"n_lines", $"n_kept", $"drop_reason", $"clean_words", $"dropped")
      .collect()
    // clean_words: goodA 5 + goodB 5 + goodC 6 = 16
    assert(out(0) == Row(1L, 5L, 3L, null, 16L, false))
    assert(out(1) == Row(2L, 4L, 3L, "boilerplate", 16L, true))
    assert(out(2) == Row(3L, 3L, 2L, "too_few_lines", 10L, true))
    assert(out(3) == Row(4L, 4L, 3L, "boilerplate", 16L, true))
    assert(out(4) == Row(5L, 4L, 0L, "too_few_lines", 0L, true))
  }

  test("c4LineFilter: cleaned text preserves line order; empty clean has md5 of ''") {
    val r = QualityRules.c4LineFilter(c4Docs).orderBy($"doc_id").collect()
    val md5OfDoc1 = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$goodA\n$goodB\n$goodC".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r(0).getAs[String]("clean_md5") == md5OfDoc1)
    assert(r(4).getAs[String]("clean_md5") == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("dupNgramCharFrac: covered characters of repeated 3-grams, exact") {
    // "a b c a b c d": 3-gram "a b c" occurs at starts 0 and 3 (dup);
    // others once. Covered tokens = 0..2 ∪ 3..5 = all but "d".
    // chars: 6 tokens of length 1 covered, total 7.
    val docs = Seq(
      (1L, "a b c a b c d"),
      (2L, "x y z w v u"),  // no repeats
      (3L, "t t t t"))      // "t t t" at starts 0,1 -> all 4 tokens covered
      .toDF("doc_id", "text")
    val out = QualityRules.dupNgramCharFrac(docs, n = 3).orderBy($"doc_id").collect()
    assert(out(0) == Row(1L, 7L, 6L, math.rint(6.0 / 7 * 1e6) / 1e6))
    assert(out(1) == Row(2L, 6L, 0L, 0.0))
    assert(out(2) == Row(3L, 4L, 4L, 1.0))
  }

  test("dupNgramCharFrac: a pathologically repetitive doc (every window a dup) stays linear") {
    // 2000 identical tokens at n=10: ~1991 dup starts — the per-token ×
    // per-start scan this operator used to do would run ~4M interpreted
    // lambda steps on this one row; the interval merge is O(starts · n)
    val rep = Seq((1L, Seq.fill(2000)("spam").mkString(" "))).toDF("doc_id", "text")
    val r = QualityRules.dupNgramCharFrac(rep, n = 10).collect().head
    assert(r == Row(1L, 8000L, 8000L, 1.0))
  }

  test("dupNgramCharFrac: sub-n docs emit zero coverage, not null explosions") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val r = QualityRules.dupNgramCharFrac(docs, n = 3).collect().head
    assert(r == Row(1L, 2L, 0L, 0.0))
  }

  test("c4LineFilter: '!'/'?'/closing-quote are terminal; ',' is not") {
    val docs = Seq((1L,
      "does this line have five words?\nyes this one has six words!\n" +
      "he said \"five words in quotes\"\nfive words but trailing comma,"))
      .toDF("doc_id", "text")
    val r = QualityRules.c4LineFilter(docs, minLinesKept = 1).collect().head
    assert(r.getAs[Long]("n_kept") == 3L)
    assert(!r.getAs[Boolean]("dropped"))
  }

  test("globalLineDedup: a line in >= maxDocFreq distinct docs is scrubbed everywhere") {
    import org.apache.spark.sql.functions.{lit, md5}
    val docs = Seq(
      (1L, "a b x y"),   // "a b" + "x y"
      (2L, "a b p q"),   // "a b" repeats (df=4 incl. partial doc 5)
      (3L, "a b r s"),
      (4L, "u v"),       // unique line untouched
      (5L, "a b c"),     // partial trailing line "c" survives
    ).toDF("doc_id", "text")
    val out = QualityRules.globalLineDedup(docs, lineTokens = 2, maxDocFreq = 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String)].collect()
    def h(s: String) = docs.sparkSession.range(1).select(md5(lit(s))).as[String].head()
    assert(out(0) == ((1L, 2L, 1L, h("x y"))))
    assert(out(1) == ((2L, 2L, 1L, h("p q"))))
    assert(out(2) == ((3L, 2L, 1L, h("r s"))))
    assert(out(3) == ((4L, 1L, 1L, h("u v"))))
    assert(out(4) == ((5L, 2L, 1L, h("c"))))
  }

  test("globalLineDedup: kept lines reassemble in original order; duplicate line within ONE doc survives") {
    import org.apache.spark.sql.functions.{lit, md5}
    // "z z" occurs twice in doc 1 but in only one DISTINCT doc → kept;
    // order of kept lines must be line order, not hash order
    val docs = Seq((1L, "z z m n z z")).toDF("doc_id", "text")
    val out = QualityRules.globalLineDedup(docs, lineTokens = 2, maxDocFreq = 2)
      .as[(Long, Long, Long, String)].head()
    def h(s: String) = docs.sparkSession.range(1).select(md5(lit(s))).as[String].head()
    assert(out == ((1L, 3L, 3L, h("z z m n z z"))))
  }
}
