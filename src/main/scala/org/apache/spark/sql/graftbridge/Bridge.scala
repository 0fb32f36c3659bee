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

  /** Free the storage behind a `localCheckpoint()`ed Dataset. Iterative
    * algorithms (connected components, k-means) checkpoint every round;
    * `Dataset.unpersist` can't reach checkpoint storage (it only talks to
    * the cache manager), so superseded rounds would otherwise accumulate
    * for the life of the session. This walks the plan to the LogicalRDD
    * the checkpoint produced and unpersists its RDD directly. */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ => ()
      }
}
