package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: for seed s in [0, numHashes),
  * sig(s) = min over shingles x of md5(s ++ ":" ++ x), as lowercase hex
  * — exactly the value the HOF formulation
  * `array_min(transform(sh, x => md5(concat(s, ':', x))))` produces,
  * and exactly what the DuckDB oracle computes.
  *
  * Why native (SURVEY §7.3): the HOF version interprets an expression
  * tree per (element × seed) — 16 × ~400 evaluations per row with
  * UTF8String concat allocations. This implementation walks the raw
  * bytes once per (element × seed) with a reused MessageDigest and
  * compares 16-byte digests unsigned-lexicographically (equivalent to
  * comparing their hex strings — hex is monotonic per nibble), only
  * hex-encoding the winners. CodegenFallback: the md5 loop dominates,
  * codegen'ing the wrapper buys nothing.
  *
  * Registered as SQL function `graft_minhash_signature` by
  * [[graft.GraftExtensions]].
  */
case class MinHashSignature(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      val v = right.eval(InternalRow.empty)
      if (v != null && v.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_signature requires numHashes >= 1, got $v")
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_minhash_signature requires (array<string>, literal int)")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  private lazy val numHashes: Int =
    right.eval(InternalRow.empty).asInstanceOf[Int]

  private lazy val seedPrefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(s => s"$s:".getBytes("UTF-8"))

  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def lessThan(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(bytes(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override def nullSafeEval(arr: Any, n: Any): Any = {
    val a = arr.asInstanceOf[ArrayData]
    val len = a.numElements()
    val digest = md.get()
    val mins = new Array[Array[Byte]](numHashes)
    var i = 0
    while (i < len) {
      if (!a.isNullAt(i)) {
        val elemBytes = a.getUTF8String(i).getBytes
        var s = 0
        while (s < numHashes) {
          digest.reset()
          digest.update(seedPrefixes(s))
          digest.update(elemBytes)
          val h = digest.digest()
          if (mins(s) == null || lessThan(h, mins(s))) mins(s) = h
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => if (m == null) null else hex(m)): Array[Any])
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_minhash_signature"
}
