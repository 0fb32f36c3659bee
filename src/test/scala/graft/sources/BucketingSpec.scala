package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.core.Tables

/** Bucketed tables: the pre-shuffle that makes repeated big-big joins
  * affordable at 100 TB. Writing both fact tables bucketed (and sorted)
  * on the join key means every later join on that key is co-located —
  * zero exchange on either side, the sort already satisfied. The shuffle
  * is paid ONCE at write time instead of on every query. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("bucketed co-located join: no shuffle exchange on either join side") {
    val buckets = 4
    Tables(spark, dir, "orders")
      .write.bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .write.bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    try {
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      // force the big-big (sort-merge) path: broadcast would mask the
      // bucket co-location this spec exists to prove
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val q = spark.table("orders_b")
          .join(spark.table("lineitem_b"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        // sparkPlan, not executedPlan: the AdaptiveSparkPlan wrapper hides
        // its inner plan from TreeNode.collect until execution
        val plan = q.queryExecution.sparkPlan
        val smj = plan.collectFirst { case j: SortMergeJoinExec => j }
        assert(smj.nonEmpty, "expected a sort-merge join:\n" + plan.toString.take(800))
        // neither join subtree may re-shuffle: bucketing already placed
        // matching keys in matching buckets at write time
        val shufflesUnderJoin = smj.get.collect { case s: ShuffleExchangeExec => s }
        assert(shufflesUnderJoin.isEmpty,
          "bucketed join still shuffles:\n" + plan.toString.take(1200))

        // value parity with the plain (shuffling) join
        val expected = Tables(spark, dir, "orders")
          .join(Tables(spark, dir, "lineitem"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
        val got = q.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
        assert(got == expected)
        assert(got.nonEmpty)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("bucket pruning: an equality filter on the bucket key reads one bucket") {
    val buckets = 8
    Tables(spark, dir, "customer")
      .write.bucketBy(buckets, "c_custkey")
      .mode("overwrite").saveAsTable("customer_b")
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val savedAuto = spark.conf.get(autoKey)
    try {
      // autoBucketedScan turns the bucketed read OFF when no operator
      // needs the hash distribution — which also forfeits bucket pruning;
      // a lone filter query must disable it to get the pruned scan
      spark.conf.set(autoKey, "false")
      val q = spark.table("customer_b").where(col("c_custkey") === 42L)
      val plan = q.queryExecution.executedPlan.toString
      // FileSourceScanExec reports "SelectedBucketsCount: 1 out of 8"
      assert(plan.contains("SelectedBucketsCount: 1"),
        "no bucket pruning:\n" + plan.take(1000))
      assert(q.count() ==
        Tables(spark, dir, "customer").where(col("c_custkey") === 42L).count())
    } finally {
      spark.conf.set(autoKey, savedAuto)
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
