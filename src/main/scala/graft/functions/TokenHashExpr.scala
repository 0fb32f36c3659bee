package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native scalar expression: engine-portable 64-bit token hash —
  * the 31-polynomial of the string's UTF-16 code units (Java wrapping
  * semantics) pushed through the splitmix64 finalizer, the same mixer
  * family as [[MinHashSigExpr]] and [[WinnowFpExpr]].
  *
  * Exists so hash-consuming operators (SimHash q30) can carry EXACT
  * DuckDB oracles: unlike xxhash64, this hash is pure 64-bit integer
  * arithmetic an oracle recomputes losslessly (HUGEINT + xor + the
  * split multiply — see SparkEntry's winnowFpSql note). The finalizer
  * is splitmix64's output function, designed for full-avalanche bit
  * mixing, so per-bit uniformity (what SimHash needs) is on par with
  * xxhash64 while being cheaper on short tokens.
  */
case class TokenHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_hash expects a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "token_hash"

  override def nullSafeEval(input: Any): Any =
    TokenHashExpr.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |java.lang.String $s = $c.toString();
         |long $p = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $p = $p * 31 + $s.charAt($i);
         |}
         |long $x = $p;
         |$x ^= ($x >>> 30); $x *= 0xBF58476D1CE4E5B9L;
         |$x ^= ($x >>> 27); $x *= 0x94D049BB133111EBL;
         |$x ^= ($x >>> 31);
         |${ev.value} = $x;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenHashExpr =
    copy(child = newChild)
}

object TokenHashExpr {
  /** Column wrapper: string → portable 64-bit hash. */
  def tokenHash(s: Column): Column =
    Bridge.column(TokenHashExpr(Bridge.expression(s)))

  /** The same kernel as a plain function — for imperative state code
    * (streaming `mapGroupsWithState` handlers) that must agree with the
    * Column form coin-for-coin. */
  def hash(s: String): Long = {
    var p = 0L
    var i = 0
    while (i < s.length) { p = p * 31 + s.charAt(i); i += 1 }
    var x = p
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^= (x >>> 31)
    x
  }
}
