package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-n-gram shingle hashes: from a token array, the distinct
  * md5 hex digests of every n-token shingle (tokens joined by a single
  * space), in first-occurrence order — exactly the value of the HOF
  * chain `array_distinct(transform(shingles(tokens, n), md5))`
  * (TextFunctions.shingleHashesHof), which is also what every DuckDB
  * oracle computes.
  *
  * Why native (the MinHashSignature pattern): the HOF chain interprets
  * a lambda per shingle with per-call UTF8String concat allocations,
  * and it feeds the hottest operators in the library — the signature
  * table (qd03), the inverted jaccard index (qd02), and the
  * fingerprint (qt04). Here each shingle is streamed through one
  * reused MessageDigest — no intermediate shingle strings at all.
  * CodegenFallback: the md5 work dominates. Fewer than n tokens →
  * empty array, like the HOF's `when(size(w) >= n, ...)` guard.
  *
  * Registered as SQL function `graft_shingle_hashes` by
  * [[graft.GraftExtensions]].
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      val v = right.eval(InternalRow.empty)
      if (v != null && v.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_hashes requires shingle size n >= 1, got $v")
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_shingle_hashes requires (array<string>, literal int)")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private lazy val n: Int = right.eval(InternalRow.empty).asInstanceOf[Int]

  private val Space = " ".getBytes("UTF-8")

  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(arr: Any, ignored: Any): Any = {
    val toks = arr.asInstanceOf[ArrayData]
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val digest = md.get()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= len - n) {
      digest.reset()
      var k = 0
      while (k < n) {
        // concat_ws semantics over split() output: tokens are non-null
        if (!toks.isNullAt(i + k)) digest.update(toks.getUTF8String(i + k).getBytes)
        if (k < n - 1) digest.update(Space)
        k += 1
      }
      seen.add(Md5Hex.hex(digest.digest()))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_shingle_hashes"
}

/** shared lowercase-hex encoding of a 16-byte digest */
private[expressions] object Md5Hex {
  private val HexChars = "0123456789abcdef".toCharArray

  def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(bytes(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}
