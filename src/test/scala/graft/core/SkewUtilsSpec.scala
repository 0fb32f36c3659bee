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
