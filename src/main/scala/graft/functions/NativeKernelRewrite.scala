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
  * as the HOF fold, so results are bit-identical (spec-asserted). The
  * zero-norm edge of the cosine fusion also preserves Divide semantics:
  * CosineSimExpr is constructed with the session's ANSI-following
  * failOnError, so a zero-norm vector throws DIVIDE_BY_ZERO under ANSI
  * and yields NULL otherwise — exactly like the unfused `dot / (norm *
  * norm)` form (spec-asserted in GraftExtensionsSpec).
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
    /** Match only when the rewrite is semantics-preserving: the HOF fold
      * returns NULL for null elements (null*y → null poisons the sum) and
      * for ragged lengths (zip_with pads with nulls), while the fused
      * kernel reads raw doubles over min(len). So require non-nullable
      * element types here, and [[guarded]] wraps the kernel in a length
      * check that reproduces the NULL-on-mismatch behavior. */
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b, MulLambda()),
          Literal(zero: Double, DoubleType),
          AddLambda(),
          IdLambda())
        if zero == 0.0d && nonNullDoubles(a) && nonNullDoubles(b) &&
          a.deterministic && b.deterministic =>
        // determinism required: [[guarded]] duplicates a and b into the
        // Size() guard — a non-deterministic child (rand()-built array)
        // could evaluate differently in guard vs kernel, which the
        // single-occurrence HOF could not
        Some((a, b))
      case _ => None
    }

    private def nonNullDoubles(e: Expression): Boolean = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, containsNull) =>
        !containsNull
      case _ => false
    }
  }

  /** dot(a,b) with the HOF's ragged-length semantics: NULL unless the
    * lengths match (Size is O(1); the If folds away when a eq b). */
  private def guarded(a: Expression, b: Expression): Expression =
    if (a.semanticEquals(b)) DotProductExpr(a, b)
    else If(EqualTo(Size(a), Size(b)), DotProductExpr(a, b),
      Literal(null, DoubleType))

  /** dot(a,b) in either the bare or the length-guarded form. */
  private object AnyDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case DotProductExpr(a, b) => Some((a, b))
      case If(EqualTo(Size(ga, _), Size(gb, _)), DotProductExpr(a, b), Literal(null, _))
        if ga.semanticEquals(a) && gb.semanticEquals(b) => Some((a, b))
      case _ => None
    }
  }

  private object CosFromDots {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Divide(
          AnyDot(a, b),
          Multiply(Sqrt(AnyDot(a1, a2)), Sqrt(AnyDot(b1, b2)), _),
          _)
        if a.semanticEquals(a1) && a.semanticEquals(a2) &&
           b.semanticEquals(b1) && b.semanticEquals(b2) &&
           a.deterministic && b.deterministic => Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val afterDot = plan.transformAllExpressions {
      case HofDot(a, b) => guarded(a, b)
    }
    afterDot.transformAllExpressions {
      case CosFromDots(a, b) =>
        if (a.semanticEquals(b)) CosineSimExpr(a, b)
        else If(EqualTo(Size(a), Size(b)), CosineSimExpr(a, b),
          Literal(null, DoubleType))
    }
  }
}
