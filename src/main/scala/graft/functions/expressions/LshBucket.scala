package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native random-hyperplane LSH bucket: `planes` sign bits of
  * deterministic md5-derived projections over an `array<double>`
  * vector, as a '0'/'1' string — exactly
  * VectorFunctions.lshBucketHof (plane j's weight for component i is
  * hexdigit₁(md5("j:i")) − 7.5, summed i-ascending as a left fold) and
  * exactly the DuckDB oracle of qs02.
  *
  * Why native: the HOF formulation evaluates planes × dim interpreted
  * `element_at` + multiply expressions per row (512 lambda frames per
  * vector at 8×64) — the dominant cost of qs02 and of the hot-block
  * guard in embeddingNearDups. Here the weight matrix is materialized
  * once per expression instance and each row is one primitive
  * double-loop. CodegenFallback: the loop is already tight JVM code.
  *
  * Null semantics mirror the HOF: a null element poisons every
  * projection (null ≥ 0 is null → `otherwise("0")`), so the bucket
  * degenerates to all-'0'; a vector shorter than `dim` is an error in
  * the HOF (ANSI element_at) and yields NULL here — embeddings are
  * fixed-dim so neither occurs in practice.
  *
  * Registered as SQL function `graft_lsh_bucket` by
  * [[graft.GraftExtensions]].
  */
case class LshBucket(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_lsh_bucket requires (array<double>, literal int planes, literal int dim)")
    }

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  private lazy val planes: Int = second.eval(InternalRow.empty).asInstanceOf[Int]
  private lazy val dim: Int = third.eval(InternalRow.empty).asInstanceOf[Int]

  /** w(j)(i) = (first hex nibble of md5("j:i")) − 7.5 — identical to
    * `conv(substring(md5(lit("j:i")), 1, 1), 16, 10) − 7.5`. */
  private lazy val weights: Array[Array[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes) { j =>
      Array.tabulate(dim) { i =>
        digest.reset()
        val h = digest.digest(s"$j:$i".getBytes("UTF-8"))
        (((h(0) >> 4) & 0xf) - 7.5)
      }
    }
  }

  private lazy val allZero: UTF8String =
    UTF8String.fromString("0" * planes)

  override def nullSafeEval(vec: Any, p: Any, d: Any): Any = {
    val a = vec.asInstanceOf[ArrayData]
    if (a.numElements() < dim) return null
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return allZero   // null poisons every projection
      i += 1
    }
    val out = new Array[Byte](planes)
    var j = 0
    while (j < planes) {
      val w = weights(j)
      var s = 0.0
      var k = 0
      while (k < dim) {
        s += a.getDouble(k) * w(k)
        k += 1
      }
      out(j) = if (s >= 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
                                                 newSecond: Expression,
                                                 newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_lsh_bucket"
}
