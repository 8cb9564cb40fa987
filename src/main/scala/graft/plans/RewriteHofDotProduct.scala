package graft.plans

import graft.functions.LongArrayDot
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the natural higher-order dot-product
  * pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * into the codegen'd [[LongArrayDot]] kernel. The HOF form is what a
  * SQL user writes; interpreted lambda evaluation makes it ~100×
  * slower on pair spaces (SURVEY.md §4). Semantics match exactly:
  * LongArrayDot yields NULL on ragged pairs just as the zip_with null
  * padding does, and the rewrite is skipped when array elements are
  * nullable (a NULL element nulls the HOF result; the kernel assumes
  * none).
  *
  * Registered through GraftExtensions (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  /** lambda of exactly two args combined by `op(arg0, arg1)` (either order) */
  private def isBinOp(lf: LambdaFunction, isOp: Expression => Option[(Expression, Expression)]): Boolean =
    lf.arguments match {
      case Seq(a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        isOp(lf.function).exists { case (l, r) =>
          (isVar(l, a) && isVar(r, b)) || (isVar(l, b) && isVar(r, a))
        }
      case _ => false
    }

  private def longElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          zw @ ZipWith(left, right, mul: LambdaFunction),
          Literal(0L, LongType),
          merge: LambdaFunction,
          finish: LambdaFunction,
        )
        // LEGACY evalMode only: under ANSI the HOF form throws on Long
        // overflow while the kernel wraps — rewriting would change
        // observable semantics on overflowing inputs.
        if longElems(left) && longElems(right) &&
          isBinOp(mul, { case Multiply(l, r, EvalMode.LEGACY) => Some((l, r)); case _ => None }) &&
          isBinOp(merge, { case Add(l, r, EvalMode.LEGACY) => Some((l, r)); case _ => None }) &&
          (finish.arguments match {
            case Seq(v: NamedLambdaVariable) => isVar(finish.function, v)
            case _ => false
          }) =>
      val _ = zw
      LongArrayDot(left, right)
  }
}
