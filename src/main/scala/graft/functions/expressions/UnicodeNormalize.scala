package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native codegen'd expression — Spark has
  * no built-in for it, yet a multilingual corpus pipeline needs it
  * before ANY hash-keyed stage: `café` composed (U+00E9) and
  * decomposed (`e` + U+0301) are byte-different strings that render
  * identically, so exact dedup (qd01), shingle hashing, URL keys, and
  * tokenizer censuses all silently treat the same text as distinct
  * until forms are normalized. One `java.text.Normalizer` call per
  * row, generated as a single static invocation (the StubHashes
  * discipline — no interpreted fallback in the hot path).
  *
  * `form` must be a FOLDABLE string: NFC | NFD | NFKC | NFKD
  * (validated at analysis time, resolved once — never parsed per row).
  * NFC is the web/DuckDB-parity form (`nfc_normalize` — the qt46
  * oracle); NFKC is the tokenizer-prep form (SentencePiece's default);
  * the D forms feed accent stripping. Null in → null out.
  *
  * Registered as SQL function `graft_unicode_normalize` by
  * [[graft.GraftExtensions]].
  */
case class UnicodeNormalize(child: Expression, form: Expression)
    extends BinaryExpression {

  override def left: Expression = child
  override def right: Expression = form

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_unicode_normalize requires a string input, got ${child.dataType.simpleString}")
    else if (form.dataType != StringType || !form.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_unicode_normalize requires a foldable string form (NFC|NFD|NFKC|NFKD)")
    else {
      val f = form.eval()
      if (f == null || !UnicodeNormalize.validForms.contains(f.toString))
        TypeCheckResult.TypeCheckFailure(
          s"unknown normalization form '$f' (expected NFC|NFD|NFKC|NFKD)")
      else TypeCheckResult.TypeCheckSuccess
    }

  override def dataType: DataType = StringType

  @transient private lazy val normForm: java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(form.eval().toString)

  override def nullSafeEval(input: Any, formVal: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], normForm)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the form resolves once at plan time and rides as a reference
    // object — the generated code is one static call per row
    val formRef = ctx.addReferenceObj("normForm", normForm,
      classOf[java.text.Normalizer.Form].getName)
    defineCodeGen(ctx, ev, (c, _) =>
      s"graft.functions.expressions.UnicodeNormalize.normalize($c, $formRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnicodeNormalize =
    copy(child = newLeft, form = newRight)
}

object UnicodeNormalize {
  private[expressions] val validForms = Set("NFC", "NFD", "NFKC", "NFKD")

  /** static per-row kernel (referenced by the generated code) */
  def normalize(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    // already-normalized fast path: isNormalized is a cheap scan and
    // most real text is NFC already — skips the allocation entirely
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}
