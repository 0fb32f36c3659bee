package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowed (MOSS-style) document
  * fingerprints — rolling char k-gram hashes, minimum of each sliding
  * window of w gram hashes, distinct, sorted. One fused O(len·k + len·w)
  * loop per row.
  *
  * The declarative HOF formulation
  * (transform(sequence…substring…) → transform(sequence…array_min(slice)))
  * is quadratic IN PRACTICE: CollapseProject inlines the gram-hash array
  * into every window element, so the whole k-gram pass re-runs per window
  * position in interpreted HOF eval — measured minutes for 5k docs where
  * this expression takes milliseconds.
  *
  * Gram hash = splitmix64 finalizer over a 31-polynomial of the k chars —
  * deterministic across runs, same mixer family as MinHashSigExpr.
  */
case class WinnowFpExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 1, s"need k>=2, w>=1; got k=$k w=$w")

  // SQL-exposed: reject wrong-typed args at analysis, not mid-job
  // (ExpectsInputTypes is unusable here — AbstractDataType is
  // private[sql] in Spark 4)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fp expects a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fp"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    val grams = n - k + 1
    val wins = grams - w + 1
    if (wins <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val gh = new Array[Long](grams)
    var i = 0
    while (i < grams) {
      var p = 0L
      var j = 0
      while (j < k) { p = p * 31 + s.charAt(i + j); j += 1 }
      var x = p
      x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
      x ^= (x >>> 27); x *= 0x94D049BB133111EBL
      x ^= (x >>> 31)
      gh(i) = x
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i < wins) {
      var m = gh(i)
      var j = 1
      while (j < w) { if (gh(i + j) < m) m = gh(i + j); j += 1 }
      sel.add(m)
      i += 1
    }
    val out = new Array[Long](sel.size)
    val it = sel.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val n = ctx.freshName("n")
      val grams = ctx.freshName("grams")
      val wins = ctx.freshName("wins")
      val gh = ctx.freshName("gh")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val p = ctx.freshName("p")
      val x = ctx.freshName("x")
      val m = ctx.freshName("m")
      val sel = ctx.freshName("sel")
      val out = ctx.freshName("out")
      val it = ctx.freshName("it")
      s"""
         |java.lang.String $s = $c.toString();
         |int $n = $s.length();
         |int $grams = $n - $k + 1;
         |int $wins = $grams - $w + 1;
         |if ($wins <= 0) {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(new long[0]);
         |} else {
         |  long[] $gh = new long[$grams];
         |  for (int $i = 0; $i < $grams; $i++) {
         |    long $p = 0L;
         |    for (int $j = 0; $j < $k; $j++) { $p = $p * 31 + $s.charAt($i + $j); }
         |    long $x = $p;
         |    $x ^= ($x >>> 30); $x *= 0xBF58476D1CE4E5B9L;
         |    $x ^= ($x >>> 27); $x *= 0x94D049BB133111EBL;
         |    $x ^= ($x >>> 31);
         |    $gh[$i] = $x;
         |  }
         |  java.util.TreeSet<Long> $sel = new java.util.TreeSet<Long>();
         |  for (int $i = 0; $i < $wins; $i++) {
         |    long $m = $gh[$i];
         |    for (int $j = 1; $j < $w; $j++) {
         |      if ($gh[$i + $j] < $m) $m = $gh[$i + $j];
         |    }
         |    $sel.add($m);
         |  }
         |  long[] $out = new long[$sel.size()];
         |  int $i = 0;
         |  for (java.util.Iterator<Long> $it = $sel.iterator(); $it.hasNext(); $i++) {
         |    $out[$i] = ((Long) $it.next()).longValue();
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFpExpr =
    copy(child = newChild)
}

object WinnowFpExpr {
  /** Column wrapper: text → array<long> of winnowed k-gram fingerprints. */
  def winnowFp(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFpExpr(Bridge.expression(text), k, w))
}
