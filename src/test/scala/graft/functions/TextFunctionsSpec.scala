package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def one[T: org.apache.spark.sql.Encoder](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as[T](implicitly)).head()

  test("tokens splits on runs of whitespace") {
    val t = Seq("  a  b\tc \n d ").toDF("t")
      .select(TextFunctions.tokens($"t")).as[Seq[String]].head()
    assert(t == Seq("a", "b", "c", "d"))
  }

  test("bpeTokenCount segments letters/digits/punct") {
    val n = Seq("ab12 c!d").toDF("t")
      .select(TextFunctions.bpeTokenCount($"t")).as[Int].head()
    // ab | 12 | c | ! | d
    assert(n == 5)
  }

  test("shingles: n-grams, and empty when doc shorter than n") {
    val s = Seq("a b c d").toDF("t")
      .select(TextFunctions.shingles($"t", 3)).as[Seq[String]].head()
    assert(s == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextFunctions.shingles($"t", 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("native minhash signature bit-matches the HOF reference on the fixture") {
    val docs = graft.Tables(spark, sf0001).documents
    val mismatches = docs.select(
        TextFunctions.minhashSignature($"text", 16).as("native"),
        TextFunctions.minhashSignatureHof($"text", 16).as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(mismatches == 0)
  }

  test("minhash signature: length, containment, identical-doc equality") {
    val df = Seq("a b c d e f", "a b c d e f", "totally different words here now")
      .toDF("t")
      .select(TextFunctions.minhashSignature($"t", 16).as("sig"))
      .as[Seq[String]].collect()
    assert(df.forall(_.length == 16))
    assert(df(0) == df(1))
    assert(df(0) != df(2))
  }

  test("native shingle hashes bit-match the HOF reference on the fixture") {
    val docs = graft.Tables(spark, sf0001).documents
    val mismatches = docs.select(
        TextFunctions.shingleHashes($"text").as("native"),
        TextFunctions.shingleHashesHof($"text").as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(mismatches == 0)
    // short-doc guard: fewer tokens than n → empty, like the HOF
    val short = Seq("a b").toDF("t")
      .select(TextFunctions.shingleHashes($"t", 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("native simhash16 bit-matches the HOF reference on the fixture") {
    val docs = graft.Tables(spark, sf0001).documents
    val mismatches = docs.select(
        TextFunctions.simhash16($"text").as("native"),
        TextFunctions.simhash16Hof($"text").as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(mismatches == 0)
  }

  test("fused shingle-simhash bit-matches the unfused formulation") {
    val docs = graft.Tables(spark, sf0001).documents
    val mismatches = docs.select(
        TextFunctions.simhash16Shingles($"text").as("fused"),
        TextFunctions.simhash16ShinglesUnfused($"text").as("unfused"))
      .filter($"fused" =!= $"unfused").count()
    assert(mismatches == 0)
    // short doc (no shingles) and repeated shingles (distinctness)
    val edge = Seq("a b", "x y z x y z x y z").toDF("t")
      .select(
        TextFunctions.simhash16Shingles($"t").as("fused"),
        TextFunctions.simhash16ShinglesUnfused($"t").as("unfused"))
      .collect()
    edge.foreach(r => assert(r.getString(0) === r.getString(1)))
    assert(edge(0).getString(0) === "0" * 16) // no shingles -> all-zero votes
  }

  test("langIdHeuristic picks the dominant stopword set deterministically") {
    val preds = Seq(
      "the cat is on the mat",
      "el gato que en la casa los",
      "le chat est dans les maisons des",
      "der hund ist von das und nicht",
      "zzz qqq www").toDF("t")
      .select(TextFunctions.langIdHeuristic($"t")).as[String].collect().toSeq
    assert(preds == Seq("en", "es", "fr", "de", "und"))
  }

  test("qualityScore is in [0,1] and favors diverse text") {
    val scores = Seq(
      "the quick brown fox jumps over the lazy dog and runs away to the hills in the morning",
      "a a a a a a a a a a a a a a a a").toDF("t")
      .select(TextFunctions.qualityScore($"t")).as[Double].collect()
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("fingerprint: 4 pipe-joined hashes, stable under word-order-preserving identity") {
    val fps = Seq("a b c d e f g h", "a b c d e f g h").toDF("t")
      .select(TextFunctions.fingerprint($"t")).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0).split('|').length == 4)
    assert(fps(0).split('|').forall(_.length == 32))
  }

  test("shingle expressions reject non-positive n at analysis time") {
    val df = Seq("a b c").toDF("t")
    for (fn <- Seq("graft_shingle_simhash16", "graft_shingle_simhash64",
                   "graft_shingle_hashes", "graft_minhash_signature")) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.select(call_function(fn, split($"t", " "), lit(0))).collect()
      }
      assert(e.getMessage.contains(">= 1"), s"$fn: ${e.getMessage}")
      // n = 1 stays legal
      df.select(call_function(fn, split($"t", " "), lit(1))).collect()
    }
  }

  test("letBound evaluates once and binds correctly") {
    val out = Seq("x y z").toDF("t")
      .select(TextFunctions.letBound(TextFunctions.tokens($"t")) { w =>
        size(w) + size(w)
      }).as[Int].head()
    assert(out == 6)
  }

  test("htmlToText: scripts/styles/comments die wholesale, tags strip, entities decode") {
    val html =
      """<html><head><STYLE>body { color: red }</STYLE>
        |<script type="text/js">var x = "<b>not text</b>";</script></head>
        |<body><!-- hidden --><h1>Title</h1>
        |<p>A &amp; B &lt;ok&gt; &quot;q&quot; &#39;s&#39;&nbsp;end.</p></body></html>""".stripMargin
    val got = Seq(html).toDF("t")
      .select(TextFunctions.htmlToText($"t")).as[String].head()
    assert(got == "Title A & B <ok> \"q\" 's' end.", s"got '$got'")
  }

  test("htmlToText: plain text passes through with whitespace collapsed") {
    val got = Seq("  plain   text\n\nhere ").toDF("t")
      .select(TextFunctions.htmlToText($"t")).as[String].head()
    assert(got == "plain text here")
  }
}
