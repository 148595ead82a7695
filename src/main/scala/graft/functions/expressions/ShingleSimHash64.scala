package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit fused shingle-SimHash — the PRODUCTION-width fingerprint
  * (ShingleSimHash16 is the oracle-demo size): bit j is set iff
  * strictly more distinct shingle md5 digests have bit j of their
  * first 8 bytes set than not. Same one-pass structure as the 16-bit
  * expression; 64 vote counters over the digest's leading 64 BITS
  * (the 16-bit variant votes on the high bit of each leading nibble,
  * i.e. bits 0,4,8,... — a subset of these). Output is a 64-char
  * '0'/'1' string: hamming distance = char diff count, banding =
  * substring slices, exactly like the 16-bit contract.
  *
  * Registered as SQL function `graft_shingle_simhash64` by
  * [[graft.GraftExtensions]].
  */
case class ShingleSimHash64(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      // the literal is foldable, so reject degenerate shingle sizes at
      // analysis time: n <= 0 would "vote" once on the empty input's
      // md5 and return a meaningless constant fingerprint
      val v = right.eval(InternalRow.empty)
      if (v != null && v.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_simhash64 requires shingle size n >= 1, got $v")
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_shingle_simhash64 requires (array<string>, literal int)")
  }

  override def dataType: DataType = StringType

  private lazy val n: Int = right.eval(InternalRow.empty).asInstanceOf[Int]

  private val Space = " ".getBytes("UTF-8")

  @transient private lazy val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(arr: Any, ignored: Any): Any = {
    val toks = arr.asInstanceOf[ArrayData]
    val len = toks.numElements()
    val digest = md.get()
    val seen = new java.util.HashSet[UTF8String]()
    val counts = new Array[Int](64)
    var total = 0
    var i = 0
    while (i <= len - n) {
      digest.reset()
      var k = 0
      while (k < n) {
        if (!toks.isNullAt(i + k)) digest.update(toks.getUTF8String(i + k).getBytes)
        if (k < n - 1) digest.update(Space)
        k += 1
      }
      val h = digest.digest()
      if (seen.add(Md5Hex.hex(h))) {
        total += 1
        var j = 0
        while (j < 64) {
          if (((h(j / 8) >> (7 - j % 8)) & 1) == 1) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](64)
    var j = 0
    while (j < 64) {
      out(j) = if (counts(j) * 2 > total) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_shingle_simhash64"
}
