package graft.plans

import graft.functions.expressions.{CenteredDot, DotProduct}
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, Subtract, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the declarative HOF dot-product fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (s, v) => s + v) }}}
  *
  * into the native codegen'd [[DotProduct]] — the SURVEY §7.3
  * "custom `Rule[LogicalPlan]`" surface: a user (or the BI tool in
  * front of them) writes the composable built-ins form, and the plan
  * that executes is the tight primitive loop. The HOF chain
  * interprets two lambda frames per element and boxes the double
  * accumulator; on an embedding pair scan (qd04/qs01-shaped) that is
  * the hot path's whole cost.
  *
  * The rewrite fires only where it is bit-exact (DotProductSpec pins
  * HOF ≡ native equality, including the NULL contract):
  *   - both sides are `array<double>`;
  *   - the zip lambda is exactly `x * y` over its own two variables;
  *   - the fold zero is literal `+0.0` (a `-0.0` seed can surface in
  *     an all-negative-zero sum, so it is left alone);
  *   - the merge lambda is exactly `acc + elem`; IEEE `+`/`×` are
  *     commutative bit-for-bit, so either operand order matches;
  *   - the finish lambda is the identity the DataFrame API emits.
  *
  * Registered by [[graft.GraftExtensions]] both at builder time
  * (`injectOptimizerRule`) and post-hoc on reused sessions
  * (`spark.experimental.extraOptimizations`).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isPlusZero(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  /** the two operands are exactly this lambda's two variables (either
    * order — IEEE + and × commute bitwise) */
  private def usesBothVars(l: Expression, r: Expression,
                           p1: NamedLambdaVariable, p2: NamedLambdaVariable): Boolean =
    (l, r) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        (a.exprId == p1.exprId && b.exprId == p2.exprId) ||
          (a.exprId == p2.exprId && b.exprId == p1.exprId)
      case _ => false
    }

  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  /** the lambda is exactly `p1 - p2` (subtraction does NOT commute, so
    * operand order is strict — `(a,b) => b - a` is left alone) */
  private def isOrderedSub(l: Expression, r: Expression,
                           p1: NamedLambdaVariable, p2: NamedLambdaVariable): Boolean =
    (l, r) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        a.exprId == p1.exprId && b.exprId == p2.exprId
      case _ => false
    }

  /** centered-vector pattern: zip_with(x, mu, (a,b) -> a - b) over
    * array<double> sides */
  private object CenteredZip {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ZipWith(x, mu,
            LambdaFunction(Subtract(l, r, _),
              Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _))
          if isDoubleArray(x) && isDoubleArray(mu) && isOrderedSub(l, r, p1, p2) =>
        Some((x, mu))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(x, y, _),
              Seq(p1: NamedLambdaVariable, p2: NamedLambdaVariable), _)),
          zero,
          LambdaFunction(Add(s, v, _),
            Seq(m1: NamedLambdaVariable, m2: NamedLambdaVariable), _),
          finish)
        if isDoubleArray(a) && isDoubleArray(b) && isPlusZero(zero) &&
          usesBothVars(x, y, p1, p2) && usesBothVars(s, v, m1, m2) &&
          isIdentityFinish(finish) =>
      DotProduct(a, b)
    // fuse dot(zip_with(x, mu, _-_), v) -> centered dot: removes the
    // interpreted subtraction lambda AND the intermediate array. Safe
    // in either operand position (IEEE x commutes bitwise per term and
    // the fold order is unchanged); NULL contracts coincide — a length
    // mismatch between x and mu surfaces as a null zip element in the
    // composed form and as the explicit length check in CenteredDot.
    case DotProduct(CenteredZip(x, mu), v) if isDoubleArray(v) =>
      CenteredDot(x, mu, v)
    case DotProduct(v, CenteredZip(x, mu)) if isDoubleArray(v) =>
      CenteredDot(x, mu, v)
  }
}
