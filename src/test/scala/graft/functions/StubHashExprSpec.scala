package graft.functions

import graft.SparkTestBase
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The compiled stub-hash expressions (StubHashes / TextDhash56Expr &
  * co.) must be BIT-IDENTICAL to the unrolled Column-composition forms
  * they replaced — the unrolled forms are the executable semantic spec
  * (and the DuckDB oracles mirror them, so equality here is what keeps
  * the qm gate rows green with zero oracle churn). */
class StubHashExprSpec extends SparkTestBase {
  import spark.implicits._

  private def paritySweep(texts: Seq[String]): Unit = {
    val df = texts.toDF("text")
    val cmp = df.select(
      Multimodal.textDhash56($"text").as("d_fast"),
      Multimodal.textDhash56Unrolled($"text").as("d_spec"),
      Multimodal.textAudioFp32($"text").as("f_fast"),
      Multimodal.textAudioFp32Unrolled($"text").as("f_spec"),
      Multimodal.textAudioFp63($"text").as("w_fast"),
      Multimodal.textAudioFp63Unrolled($"text").as("w_spec"),
      Multimodal.textAudioEnergy($"text").as("e_fast"),
      Multimodal.textAudioEnergyUnrolled($"text").as("e_spec"))
    val bad = cmp.filter($"d_fast" =!= $"d_spec" || $"f_fast" =!= $"f_spec" ||
      $"w_fast" =!= $"w_spec" || $"e_fast" =!= $"e_spec")
    assert(bad.count() === 0, s"divergent rows: ${bad.take(3).mkString("; ")}")
  }

  test("compiled expressions match the unrolled spec on adversarial strings") {
    paritySweep(Seq(
      "",                          // empty: every cell 0
      "a", "ab",                   // shorter than the grid: stride 1, wraps via % n
      "x" * 63, "x" * 64, "x" * 65, // around the dhash grid size
      "y" * 131, "y" * 132, "y" * 133, // around the audio grid size
      "z" * 255, "z" * 256, "z" * 257, // around the WIDE audio grid size
      (0 until 500).map(i => ('!' + i % 90).toChar).mkString, // varied ASCII
      "héllo wörld ü ß é",         // 2-byte UTF-8 chars (non-ASCII path)
      "日本語のテキストです、かなり長い文字列にします日本語のテキスト", // CJK
      "mixed ascii と 日本語 and ascii again, stretched to cross cells " * 4,
      " control chars ",
      "emoji 😀😁 surrogate pairs 🎉 end", // 4-byte cps
      "tab\tand\nnewline\rchars"))
  }

  test("compiled expressions match the unrolled spec on the documents table") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").select($"text")
    paritySweep(docs.as[String].collect().toSeq)
  }

  test("null text propagates null, and SQL registration works") {
    val df = Seq[Option[String]](Some("abc"), None).toDF("text")
    val out = df.selectExpr("graft_text_dhash56(text) d",
      "graft_text_audio_fp32(text) f", "graft_text_audio_energy(text) e",
      "graft_text_audio_fp63(text) w")
      .collect()
    assert(out.exists(r => !r.isNullAt(0)))
    assert(out.exists(r => r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) &&
      r.isNullAt(3)))
  }

  test("dhash56 stays in 56 bits, fp32 in 32, fp63 in 63") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val r = docs.select(
      max(Multimodal.textDhash56($"text")).as("dmax"),
      min(Multimodal.textDhash56($"text")).as("dmin"),
      max(Multimodal.textAudioFp32($"text")).as("fmax"),
      min(Multimodal.textAudioFp32($"text")).as("fmin"),
      max(Multimodal.textAudioFp63($"text")).as("wmax"),
      min(Multimodal.textAudioFp63($"text")).as("wmin")).head()
    assert(r.getLong(1) >= 0L && r.getLong(0) < (1L << 56))
    assert(r.getLong(3) >= 0L && r.getLong(2) < (1L << 32))
    assert(r.getLong(5) >= 0L, "fp63 must stay positive (bit 63 never set)")
  }
}
