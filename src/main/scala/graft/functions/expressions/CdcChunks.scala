package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined chunking — the value of
  * [[graft.operators.ContentChunks.cdcChunksHof]] (window-8 polynomial
  * rolling hash mod 1000003, boundary at residue 63 of 64), computed
  * in one imperative pass per row.
  *
  * Why native (the ShingleHashes pattern): the HOF formulation
  * interprets ~window-size lambda applications per CHARACTER with an
  * element_at probe each — measured 5.9 s for qd20 at sf0.1, the
  * slowest query in the bench. Here the same integers come from one
  * array walk: code points once into a local array, one running
  * window sum, substrings only at boundaries. CodegenFallback: one
  * eval call per row already amortizes; the per-char lambda overhead
  * was the problem, not the call.
  *
  * Character values are Unicode code points (DuckDB `ord` semantics,
  * and `ascii()` on the testdata's pure-ASCII corpus); the HOF
  * bit-match spec pins ASCII inputs, where all three agree.
  *
  * Registered as SQL function `graft_cdc_chunks` by
  * [[graft.GraftExtensions]].
  */
case class CdcChunks(child: Expression)
    extends UnaryExpression with CodegenFallback {

  import graft.operators.ContentChunks.{Divisor, Modulus, Prime, Window}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("graft_cdc_chunks requires a string")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    // code points, one pass (ASCII fast path: length == count)
    val cps = new Array[Long](str.codePointCount(0, str.length))
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp.toLong
      ci += 1
      off += Character.charCount(cp)
    }
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val powers = new Array[Long](Window)
    powers(0) = 1L
    var k = 1
    while (k < Window) { powers(k) = powers(k - 1) * Prime; k += 1 }
    val chunks = new java.util.ArrayList[Any]()
    // `start`/`i` index code points; map back to char offsets to slice
    var start = 0
    var startOff = 0
    var i = Window - 1 // 0-based window END
    var iOff = if (n >= Window) str.offsetByCodePoints(0, Window - 1) else 0
    while (i < n) {
      var h = 0L
      var j = 0
      while (j < Window) { h += cps(i - j) * powers(j); j += 1 }
      if (h % Modulus % Divisor == Divisor - 1) {
        val endOff = iOff + Character.charCount(cps(i).toInt)
        chunks.add(UTF8String.fromString(str.substring(startOff, endOff)))
        start = i + 1
        startOff = endOff
      }
      iOff += Character.charCount(cps(i).toInt)
      i += 1
    }
    if (start < n)
      chunks.add(UTF8String.fromString(str.substring(startOff)))
    new GenericArrayData(chunks.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_cdc_chunks"
}
