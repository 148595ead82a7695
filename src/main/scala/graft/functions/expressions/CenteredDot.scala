package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst centered dot product: Σ_i (x_i − mu_i) · v_i over
  * three `array<double>` columns — the per-row kernel of the PCA plane
  * (power-iteration projections, PC1 scores, residual magnitudes).
  *
  * Why a custom Expression ([[DotProduct]]'s rationale, one step
  * further): the composed form `graft_dot_product(zip_with(x, mu,
  * (a,b) -> a-b), v)` pays an interpreted per-element lambda AND an
  * intermediate array allocation per row for the centered vector. This
  * expression fuses the subtraction into the same tight primitive loop
  * (whole-stage codegen via `doGenCode`), touching the three unsafe
  * arrays directly.
  *
  * Semantics are BIT-IDENTICAL to the composed form (the qs16/qs17/
  * qs19/qs21 oracles depend on it): sequential i=0..n-1 accumulation
  * of ((x_i − mu_i) * v_i) — the same IEEE ops in the same order as
  * DuckDB's `list_dot_product(list_transform(range, i -> x[i]-mu[i]),
  * v)`; NULL on length mismatch or any null element, exactly like the
  * zip_with-padded fold. CenteredDotSpec pins the bit-equality.
  *
  * Registered as SQL function `graft_centered_dot` by
  * [[graft.GraftExtensions]].
  */
case class CenteredDot(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_centered_dot requires three array<double> arguments, got " +
          s"${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    val v = c.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != m.numElements() || n != v.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || m.isNullAt(i) || v.isNullAt(i)) return null
      sum += (x.getDouble(i) - m.getDouble(i)) * v.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements() || $n != $c.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i) || $c.isNullAt($i)) {
         |    $bad = true;
         |  } else {
         |    $sum += ($a.getDouble($i) - $b.getDouble($i)) * $c.getDouble($i);
         |  }
         |}
         |${ev.isNull} = $bad;
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
                                                 newSecond: Expression,
                                                 newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "graft_centered_dot"
}
