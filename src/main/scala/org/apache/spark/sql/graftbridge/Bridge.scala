package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the `private[sql]` Column↔Expression converters —
  * the supported way to use a custom Catalyst Expression from the public
  * DataFrame API in Spark 4 (classic backend). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on a live session's registry (the
    * `sessionState` accessor is `private[sql]`; this package-located
    * helper is the supported way in, mirroring `column`/`expression`). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** `QueryExecutionErrors` is `private[sql]`; kernels that reproduce
    * ANSI Divide semantics (CosineSimExpr) raise the real error class
    * through this forwarder (also called from generated code). */
  def divideByZeroError(): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(null)

  /** Bloom-filter aggregate over a column — the build side of Spark's own
    * runtime-filter pattern (`InjectRuntimeFilter`), exposed for explicit
    * use. Returns a 1-row binary column: the serialized
    * `org.apache.spark.util.sketch.BloomFilter` of `xxhash64(c)`, sized
    * for `expectedItems` (clamped by the session's runtime-bloom-filter
    * confs). Bounded state per partition; partial sketches OR-merge
    * map-side like any algebraic aggregate. */
  def bloomFilterAgg(c: Column, expectedItems: Long): Column =
    column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(
        new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(expression(c))),
        expectedItems)
      .toAggregateExpression())

  /** Probe side of the runtime-filter pattern: a predicate testing
    * `xxhash64(c)` against the bloom filter produced by `bloomDf` (a
    * 1-row/1-col frame from [[bloomFilterAgg]]). The bloom frame rides as
    * a SCALAR SUBQUERY — exactly how `InjectRuntimeFilter` plants its
    * filters — so the sketch is computed once, broadcast with the plan,
    * and the probe stays inside whole-stage codegen. May return false
    * positives, never false negatives: callers confirm survivors with an
    * exact join (the sketch only PRUNES the expensive probe). */
  def bloomMightContain(bloomDf: org.apache.spark.sql.Dataset[_],
                        c: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        bloomDf.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution.analyzed),
      new org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(expression(c)))))

  /** Free the storage behind a `localCheckpoint()`ed Dataset. Iterative
    * algorithms (connected components, k-means) checkpoint every round;
    * `Dataset.unpersist` can't reach checkpoint storage (it only talks to
    * the cache manager), so superseded rounds would otherwise accumulate
    * for the life of the session.
    *
    * CONTRACT: the argument must be the Dataset returned DIRECTLY by
    * `localCheckpoint()` — its plan root is the checkpoint's LogicalRDD.
    * A derived frame (`ck.select(...)`) is rejected rather than walked:
    * walking would also unpersist any OTHER still-live checkpoint embedded
    * in the plan, truncating a lineage someone still depends on, and the
    * failure would surface later as an unrelated action dying on missing
    * blocks. */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case other => throw new IllegalArgumentException(
          "unpersistLocalCheckpoint expects a Dataset returned directly by " +
            s"localCheckpoint(); got plan root ${other.nodeName}")
      }

  /** Best-effort harness-side companion: free the frame's storage IFF its
    * plan root is a direct local checkpoint (queries like q66/q80/q103/
    * q104 return one under their storage contract); any other frame is
    * left untouched. Returns whether anything was freed. Lets Bench/Verify
    * honor the consume-then-free contract generically without knowing
    * which queries pin results.
    *
    * Guard: a LogicalRDD root alone is not proof of a checkpoint — a
    * `createDataFrame(rdd)` frame has one too, and unpersisting an RDD the
    * caller still owns would be a silent data hazard. Only an RDD actually
    * HOLDING storage (level != NONE) is freed; a plain LogicalRDD is left
    * untouched. */
  def freeIfDirectCheckpoint(df: org.apache.spark.sql.Dataset[_]): Boolean =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD
            if l.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE =>
          l.rdd.unpersist(blocking = false); true
        case _ => false
      }
}
