package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class SkewUtilsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("saltedJoin equals plain join (orders ⋈ customer)") {
    val o = Tables(spark, dir, "orders")
      .withColumnRenamed("o_custkey", "custkey")
    val c = Tables(spark, dir, "customer")
      .withColumnRenamed("c_custkey", "custkey")
    val plain = o.join(c, Seq("custkey"))
      .groupBy(col("c_mktsegment")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = SkewUtils.saltedJoin(o, c, "custkey", nSalts = 7)
      .groupBy(col("c_mktsegment")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    import spark.implicits._
    // one pathological key (80% of the fact side) + a flat tail — the
    // shape salting handles manually; this asserts Spark's RUNTIME
    // answer (AQE skew-join split) engages, which is what saves the
    // 1000-executor job when the skew isn't known in advance.
    val fact = spark.range(0, 40000)
      .select(when(col("id") % 5 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val dim = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") * 2).as("attr"))
    val confs = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val joined = fact.join(dim, Seq("k"))
      // collect() drives joined.queryExecution itself, so the SAME
      // AdaptiveSparkPlanExec finalizes (count() would build its own)
      val n = joined.collect().length.toLong
      assert(n == fact.where(col("k") < 1000).count())
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE did not split the skewed partition:\n" + plan.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedCollectSet equals plain collect_set") {
    val l = Tables(spark, dir, "lineitem")
    val plain = l.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("values"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toMap
    val salted = SkewUtils.saltedCollectSet(l, "l_orderkey", "l_partkey", nSalts = 5)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toMap
    assert(salted == plain)
  }
}
