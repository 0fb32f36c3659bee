package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: random-hyperplane LSH bucket ids for a
  * double vector — `tables` independent tables of `bits` sign-bits each,
  * one fused loop. Plane components are derived per (table, bit, dim) from
  * a splitmix64 of the packed index — deterministic across runs/engines,
  * no RNG state, no materialized plane matrix (recomputed in-register;
  * at 100 TB this trades a few FLOPs for zero broadcast state).
  *
  * Replaces a tables×bits stack of zip_with/aggregate HOF dots (which
  * allocated ~100 arrays per row).
  */
case class HyperplaneLshExpr(child: Expression, tables: Int, bits: Int)
  extends UnaryExpression {

  require(bits <= 62, "bucket id is a long")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_lsh"

  @inline private def component(t: Int, b: Int, d: Int): Double = {
    var x = (t.toLong << 42) ^ (b.toLong << 21) ^ d.toLong
    x += 0x9E3779B97F4A7C15L
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^= (x >>> 31)
    (x >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  override def nullSafeEval(vec: Any): Any = {
    val v = vec.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        var dot = 0.0
        var d = 0
        while (d < n) { dot += v.getDouble(d) * component(t, b, d); d += 1 }
        if (dot > 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val b = ctx.freshName("b")
      val d = ctx.freshName("d"); val x = ctx.freshName("x")
      val dot = ctx.freshName("dot"); val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $c.numElements();
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    double $dot = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      long $x = (((long) $t) << 42) ^ (((long) $b) << 21) ^ (long) $d;
         |      $x += 0x9E3779B97F4A7C15L;
         |      $x ^= ($x >>> 30); $x *= 0xBF58476D1CE4E5B9L;
         |      $x ^= ($x >>> 27); $x *= 0x94D049BB133111EBL;
         |      $x ^= ($x >>> 31);
         |      $dot += $c.getDouble($d) *
         |        (((double) ($x >>> 11)) / (double) (1L << 53) - 0.5);
         |    }
         |    if ($dot > 0) $bucket |= (1L << $b);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshExpr =
    copy(child = newChild)
}

object HyperplaneLshExpr {
  /** Column wrapper: vec must be array<double>; returns array<long> of
    * length `tables` (bucket id per table). */
  def lshBuckets(vec: Column, tables: Int, bits: Int): Column =
    Bridge.column(HyperplaneLshExpr(Bridge.expression(vec), tables, bits))
}
