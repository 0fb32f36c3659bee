package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Zero-denominator handling shared by eval and codegen: reproduces
  * Spark `Divide` semantics so the optimizer rewrite HOF→kernel is exact
  * (the textbook form ends in `dot / (norm*norm)`). */
object KernelErrors {
  def divByZero(): ArithmeticException = Bridge.divideByZeroError()
}

/** Native Catalyst expression: cosine similarity of two double arrays in a
  * single fused loop — no intermediate arrays, participates in whole-stage
  * codegen. Replaces the `zip_with`/`aggregate` higher-order formulation
  * (which allocates per-row arrays and boxes every element) in the ANN hot
  * paths; ~10× less per-pair cost in the brute-force verifier.
  *
  * Zero-norm inputs (empty or all-zero vector) follow `Divide` semantics,
  * captured per-instance like Divide's own `failOnError`: ANSI mode throws
  * DIVIDE_BY_ZERO, non-ANSI returns NULL — never NaN, so the optimizer
  * rewrite from the HOF form is semantics-preserving in both modes.
  */
case class CosineSimExpr(left: Expression, right: Expression,
                         failOnError: Boolean = SQLConf.get.ansiEnabled)
  extends BinaryExpression {

  // inputs must already be array<double> — the library call sites cast
  // embeddings to double once, up front (EmbeddingQueries.vecs)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // non-ANSI: zero-norm inputs yield NULL even when children don't
  override def nullable: Boolean = if (failOnError) super.nullable else true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val p = x.getDouble(i); val q = y.getDouble(i)
      dot += p * q; na += p * p; nb += q * q; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) {
      if (failOnError) throw KernelErrors.divByZero() else null
    } else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val p = ctx.freshName("p")
      val q = ctx.freshName("q")
      val denom = ctx.freshName("denom")
      val onZero =
        if (failOnError) s"throw graft.functions.KernelErrors.divByZero();"
        else s"${ev.isNull} = true;"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $p = $a.getDouble($i);
         |  double $q = $b.getDouble($i);
         |  $dot += $p * $q; $na += $p * $p; $nb += $q * $q;
         |}
         |double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |if ($denom == 0.0) {
         |  $onZero
         |} else {
         |  ${ev.value} = $dot / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  /** Column wrapper for the DataFrame API: TOTAL (zero-norm → NULL, never
    * an error, regardless of ANSI mode) — library operators (k-means
    * assignment, ANN scans) must not abort a 100 TB job on one degenerate
    * vector; their call sites guard NULL/NaN explicitly. The SQL function
    * and the optimizer rewrite keep the ANSI-following default. */
  def cosineSim(a: Column, b: Column): Column =
    Bridge.column(CosineSimExpr(Bridge.expression(a), Bridge.expression(b),
      failOnError = false))
}
