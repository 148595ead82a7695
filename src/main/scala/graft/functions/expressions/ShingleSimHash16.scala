package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused shingle-SimHash: from a token array, the 16-bit SimHash over
  * the DISTINCT md5 hashes of every n-token shingle — bit-identical to
  * `SimHash16(shingles(tokens, n))` (and the DuckDB oracle in
  * PipelineQueries.simhashNearDupsSql), but with no intermediate
  * shingle strings or hash array at all: each shingle is streamed
  * through one reused MessageDigest (the ShingleHashes loop) and its
  * 16 leading nibbles bump the vote counters in the same pass (the
  * SimHash16 loop).
  *
  * Why fused: the shingle-simhash projection is the entry stage of the
  * qd05 near-dup funnel and was its single largest cost — the
  * unfused formulation builds every shingle as an interpreted
  * higher-order-function `transform` with per-element concat
  * allocations before the native hash even starts. Fewer than n
  * tokens → zero hashes → every majority vote fails → the all-zeros
  * fingerprint, exactly like the HOF's empty-array guard.
  *
  * Registered as SQL function `graft_shingle_simhash16` by
  * [[graft.GraftExtensions]].
  */
case class ShingleSimHash16(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) if right.foldable =>
      // reject degenerate shingle sizes at analysis time (the literal
      // folds): n <= 0 would vote once on the empty input's md5
      val v = right.eval(InternalRow.empty)
      if (v != null && v.asInstanceOf[Int] >= 1) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_shingle_simhash16 requires shingle size n >= 1, got $v")
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_shingle_simhash16 requires (array<string>, literal int)")
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
    // distinctness is over the HASH values (== distinct shingles),
    // mirroring array_distinct(transform(shingles, md5)) before voting
    val seen = new java.util.HashSet[UTF8String]()
    val counts = new Array[Int](16)
    var total = 0
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
      val h = digest.digest()
      if (seen.add(Md5Hex.hex(h))) {
        total += 1
        var j = 0
        while (j < 16) {
          val nibble = if (j % 2 == 0) (h(j / 2) >> 4) & 0xf else h(j / 2) & 0xf
          if (nibble >= 8) counts(j) += 1
          j += 1
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

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_shingle_simhash16"
}
