package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: Johnson–Lindenstrauss random projection of
  * a double vector to `outDims` dimensions. Matrix entry (o, d) is the
  * same splitmix64-derived uniform[-0.5, 0.5] component the hyperplane
  * kernel uses ([[HyperplaneLshExpr.component]] arithmetic), under a
  * distinct domain tag (63) so projection and LSH planes are independent;
  * the result is scaled by √(12/outDims) so squared norms are preserved
  * in expectation (Var U[-0.5,0.5] = 1/12).
  *
  * No RNG state, no materialized matrix — entries recompute in-register
  * inside one codegen loop, so at 100 TB the projection is a pure map
  * stage with zero broadcast state, and the SAME entries are recomputable
  * anywhere (the DuckDB oracle re-derives them arithmetically, so the
  * whole projection is cross-engine exact: in-order double accumulation
  * on both sides).
  */
case class RandomProjectExpr(child: Expression, outDims: Int)
  extends UnaryExpression {

  require(outDims > 0 && outDims < (1 << 20), "outDims must fit the packed index")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "random_project"

  @inline private def component(o: Int, d: Int): Double = {
    var x = (63L << 42) ^ (o.toLong << 21) ^ d.toLong
    x += 0x9E3779B97F4A7C15L
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^= (x >>> 31)
    (x >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  override def nullSafeEval(vec: Any): Any = {
    val v = vec.asInstanceOf[ArrayData]
    val n = v.numElements()
    val scale = math.sqrt(12.0 / outDims)
    val out = new Array[Double](outDims)
    var o = 0
    while (o < outDims) {
      var acc = 0.0
      var d = 0
      while (d < n) { acc += v.getDouble(d) * component(o, d); d += 1 }
      out(o) = acc * scale
      o += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val o = ctx.freshName("o"); val d = ctx.freshName("d")
      val x = ctx.freshName("x"); val acc = ctx.freshName("acc")
      val scale = ctx.freshName("scale")
      s"""
         |int $n = $c.numElements();
         |double $scale = java.lang.Math.sqrt(12.0 / $outDims);
         |double[] $out = new double[$outDims];
         |for (int $o = 0; $o < $outDims; $o++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    long $x = (63L << 42) ^ (((long) $o) << 21) ^ (long) $d;
         |    $x += 0x9E3779B97F4A7C15L;
         |    $x ^= ($x >>> 30); $x *= 0xBF58476D1CE4E5B9L;
         |    $x ^= ($x >>> 27); $x *= 0x94D049BB133111EBL;
         |    $x ^= ($x >>> 31);
         |    $acc += $c.getDouble($d) *
         |      (((double) ($x >>> 11)) / (double) (1L << 53) - 0.5);
         |  }
         |  $out[$o] = $acc * $scale;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RandomProjectExpr {
  /** Column wrapper: vec must be array<double>; returns array<double> of
    * length `outDims`. */
  def project(vec: Column, outDims: Int): Column =
    Bridge.column(RandomProjectExpr(Bridge.expression(vec), outDims))
}
