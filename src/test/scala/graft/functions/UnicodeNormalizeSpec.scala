package graft.functions

import graft.SparkTestBase
import graft.functions.TextFunctions.{stripAccents, unicodeNormalize}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode normalization ([[graft.functions.expressions.UnicodeNormalize]]):
  * form semantics on hand fixtures, codegen/interpreted parity, the
  * accent-strip composition, and analysis-time guards. */
class UnicodeNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private val decomposed = "café"   // e + combining acute
  private val precomposed = "café"   // é

  private def run(s: String, form: String = "NFC"): String =
    Seq(s).toDF("t").select(unicodeNormalize($"t", form).as("n"))
      .as[String].collect().head

  test("NFC collapses decomposed to precomposed; stable on normalized input") {
    assert(decomposed != precomposed, "fixture must start byte-different")
    assert(run(decomposed) === precomposed)
    assert(run(precomposed) === precomposed)
    assert(run("plain ascii") === "plain ascii")
    assert(run("") === "")
  }

  test("null in, null out") {
    val got = Seq(Option.empty[String]).toDF("t")
      .select(unicodeNormalize($"t").as("n")).collect().head
    assert(got.isNullAt(0))
  }

  test("NFD expands; NFKC folds compatibility forms") {
    assert(run(precomposed, "NFD") === decomposed)
    assert(run("ﬁle", "NFKC") === "file", "fi ligature folds under NFKC")
    assert(run("ＡBC", "NFKC") === "ABC", "fullwidth A folds under NFKC")
    assert(run("ﬁle", "NFC") === "ﬁle",
      "canonical NFC must NOT fold compatibility forms")
  }

  test("codegen result equals the interpreted eval path") {
    val expr = graft.functions.expressions.UnicodeNormalize(
      Literal(UTF8String.fromString(decomposed), org.apache.spark.sql.types.StringType),
      Literal(UTF8String.fromString("NFC"), org.apache.spark.sql.types.StringType))
    val interpreted = expr.eval(null).asInstanceOf[UTF8String].toString
    assert(interpreted === precomposed)
    assert(run(decomposed) === interpreted)
  }

  test("stripAccents folds diacritics and compatibility forms, not base letters") {
    val got = Seq("résumé", "ﬁancée", "naïve", "øre")
      .toDF("t").select($"t", stripAccents($"t").as("s"))
      .as[(String, String)].collect().toMap
    assert(got("résumé") === "resume")
    assert(got("ﬁancée") === "fiancee")
    assert(got("naïve") === "naive")
    // ø is a LETTER, not base+combining-mark: honestly out of scope
    assert(got("øre") === "øre")
  }

  test("analysis-time guards: unknown form, non-foldable form, non-string input") {
    val df = Seq(("x", "NFC")).toDF("t", "f")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(unicodeNormalize($"t", "XXX")).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(org.apache.spark.sql.functions.call_function(
        "graft_unicode_normalize", $"t", $"f")).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("t").select(unicodeNormalize($"t")).collect()
    }
  }
}
