package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * Why a custom Expression (SURVEY.md §7.3, brief preference (b)): the
  * `zip_with` + `aggregate` HOF formulation is interpreted — per
  * element it allocates a lambda frame and boxes the accumulator. This
  * expression participates in whole-stage codegen via `doGenCode`,
  * emitting a tight primitive loop over the unsafe array data — the
  * hot path of the embedding pair scans (qd04/qs01/qs02).
  *
  * Semantics match the HOF version exactly: sequential i=0..n-1 double
  * accumulation (bit-identical to DuckDB's `list_dot_product` over
  * DOUBLE[]), NULL if either side is NULL. Mirroring
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` precisely also means
  * NULL when the lengths differ (zip_with pads the shorter side with
  * nulls) or when any element is null (null poisons the fold) — both
  * checked here in eval and codegen.
  *
  * Registered as SQL function `graft_dot_product` by
  * [[graft.GraftExtensions]].
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_dot_product requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      sum += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n && !$bad; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    $bad = true;
         |  } else {
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.isNull} = $bad;
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot_product"
}
