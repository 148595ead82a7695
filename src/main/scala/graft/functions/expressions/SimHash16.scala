package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 16-bit SimHash over a token array: bit j is set iff strictly
  * more DISTINCT token md5 hashes have hex digit j in [8..f] than not —
  * exactly TextFunctions.simhash16Hof ('0'/'1' string, hamming distance
  * = char diff count) and the DuckDB oracle.
  *
  * The HOF version walks 16 interpreted `filter` lambdas over the hash
  * array (16 substr+compare per hash). Here each distinct token is
  * hashed once with a reused MessageDigest and its 16 leading nibbles
  * bump 16 counters in one pass. CodegenFallback: md5 dominates.
  *
  * Registered as SQL function `graft_simhash16` by
  * [[graft.GraftExtensions]].
  */
case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash16 requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(arr: Any): Any = {
    val toks = arr.asInstanceOf[ArrayData]
    val len = toks.numElements()
    val digest = md.get()
    // distinctness is over the HASH values, mirroring
    // array_distinct(transform(tokens, md5)); distinct tokens imply
    // distinct digests, so the token set is the cheaper key
    val seen = new java.util.HashSet[UTF8String]()
    val counts = new Array[Int](16)
    var total = 0
    var i = 0
    while (i < len) {
      if (!toks.isNullAt(i)) {
        val tok = toks.getUTF8String(i)
        if (seen.add(tok)) {
          digest.reset()
          val h = digest.digest(tok.getBytes)
          total += 1
          var j = 0
          while (j < 16) {
            val nibble = if (j % 2 == 0) (h(j / 2) >> 4) & 0xf else h(j / 2) & 0xf
            if (nibble >= 8) counts(j) += 1
            j += 1
          }
        }
      }
      i += 1
    }
    val out = new Array[Byte](16)
    var j = 0
    while (j < 16) {
      out(j) = if (counts(j) * 2 > total) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash16"
}
