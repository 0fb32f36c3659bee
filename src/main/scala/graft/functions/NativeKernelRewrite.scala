package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule (injected via [[GraftExtensions]]): rewrites the
  * declarative higher-order-function formulations of the vector kernels
  * to the fused native expressions, so SQL/DataFrame users who write the
  * textbook pattern get codegen'd single-pass loops without knowing the
  * native functions exist:
  *
  *  - `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)`
  *    → `DotProductExpr(a, b)` (no intermediate zipped array, no boxing)
  *  - `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` (after the first
  *    rewrite) → `CosineSimExpr(a, b)` (one pass instead of three)
  *
  * Both rewrites are exact: same left-to-right double accumulation order
  * as the HOF fold, so results are bit-identical (spec-asserted).
  */
object NativeKernelRewrite extends Rule[LogicalPlan] {

  /** `(x, y) -> x * y` over the lambda's own two arguments. */
  private object MulLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), false) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  /** `(acc, v) -> acc + v` over the lambda's own two arguments. */
  private object AddLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), false) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  /** identity finish lambda `id -> id`. */
  private object IdLambda {
    def unapply(e: Expression): Boolean = e match {
      case LambdaFunction(x: NamedLambdaVariable, Seq(a: NamedLambdaVariable), false) =>
        x.exprId == a.exprId
      case _ => false
    }
  }

  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b, MulLambda()),
          Literal(zero: Double, DoubleType),
          AddLambda(),
          IdLambda()) if zero == 0.0d => Some((a, b))
      case _ => None
    }
  }

  private object CosFromDots {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Divide(
          DotProductExpr(a, b),
          Multiply(Sqrt(DotProductExpr(a1, a2)), Sqrt(DotProductExpr(b1, b2)), _),
          _)
        if a.semanticEquals(a1) && a.semanticEquals(a2) &&
           b.semanticEquals(b1) && b.semanticEquals(b2) => Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val afterDot = plan.transformAllExpressions {
      case HofDot(a, b) => DotProductExpr(a, b)
    }
    afterDot.transformAllExpressions {
      case CosFromDots(a, b) => CosineSimExpr(a, b)
    }
  }
}
