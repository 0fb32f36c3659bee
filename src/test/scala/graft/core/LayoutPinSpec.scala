package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** The r13 layout-declared checkpoint (`Bridge.checkpointPartitioned`):
  * a standing-state pin carried WITH its hash layout and sort order so
  * per-invocation consumers plan exchange-free / sort-free on the pinned
  * side (the in-memory face of a bucketed+sorted table — the CF tier's
  * basket and co-matrix are pinned this way).
  *
  * Binds the two properties the optimization rests on:
  *  1. rows are IDENTICAL to a plain localCheckpoint (the declaration
  *     changes planning, never content);
  *  2. a consumer keyed exactly like the declaration plans NO Exchange
  *     above the pinned scan (a plain checkpoint surfaces
  *     UnknownPartitioning and re-shuffles).
  */
class LayoutPinSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val B = org.apache.spark.sql.graftbridge.Bridge

  private def exchangesAboveScan(df: org.apache.spark.sql.DataFrame): Int = {
    // count Exchange nodes in the final executed plan (drive it first)
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    plan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("ReusedExchange")
        && !l.contains("BroadcastExchange"))
  }

  test("declared layout: identical rows, zero exchange for a matching " +
      "consumer, sort-free merge join for a sorted declaration") {
    import spark.implicits._
    val src = spark.range(20000)
      .select((col("id") % 97L).as("k"), (col("id") % 13L).as("s"),
        col("id").as("v"))

    val plain = src.repartition(8, col("k")).localCheckpoint()
    val laid = B.checkpointPartitioned(src, Seq("k"), Seq("k", "s"))
    try {
      // 1. content identical (order-insensitive)
      assert(laid.orderBy("k", "s", "v").collect().toSeq ==
        plain.orderBy("k", "s", "v").collect().toSeq)

      // 2. a k-keyed aggregate over the declared pin plans no Exchange;
      //    over the plain pin it must re-shuffle
      val aggLaid = laid.groupBy("k").agg(sum("v").as("t"))
      val aggPlain = plain.groupBy("k").agg(sum("v").as("t"))
      assert(exchangesAboveScan(aggLaid) == 0,
        "declared pin re-exchanged on its own layout")
      assert(exchangesAboveScan(aggPlain) > 0,
        "plain checkpoint unexpectedly preserved partitioning — the " +
          "declaration helper may be redundant on this Spark version")
      assert(aggLaid.orderBy("k").collect().toSeq ==
        aggPlain.orderBy("k").collect().toSeq)

      // 3. self-join on the declared keys: exchange-free AND sort-free
      //    (the declared (k, s) ordering feeds the merge join directly)
      val j = laid.as("a").join(laid.as("b"),
        Seq("k", "s")).groupBy().count()
      j.collect()
      val jPlan = j.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(!jPlan.contains("Exchange hashpartitioning"),
        "declared self-join re-exchanged")
    } finally {
      B.unpersistLocalCheckpoint(plain)
      B.unpersistLocalCheckpoint(laid)
    }
  }

  test("declared layout survives the unpersist contract") {
    val src = spark.range(1000).select((col("id") % 7L).as("k"),
      col("id").as("v"))
    val laid = B.checkpointPartitioned(src, Seq("k"))
    assert(laid.count() == 1000)
    // the rewrapped root is a LogicalRDD holding the checkpoint storage —
    // the strict Bridge free contract must accept it
    B.unpersistLocalCheckpoint(laid)
  }
}
