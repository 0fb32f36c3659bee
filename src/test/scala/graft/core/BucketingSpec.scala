package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Co-located joins via bucketing (the scale story for repeated fact-dim
  * joins on the same key): two tables bucketed+sorted on the join key must
  * join with NO shuffle exchange on either side. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("bucketed join plans without a shuffle exchange") {
    val o = Tables(spark, dir, "orders").withColumnRenamed("o_custkey", "custkey")
    val c = Tables(spark, dir, "customer").withColumnRenamed("c_custkey", "custkey")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    // a fresh in-memory catalog doesn't know about a previous JVM's
    // managed-table dirs — remove them or saveAsTable fails with
    // LOCATION_ALREADY_EXISTS
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("b_orders", "b_customer").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        d.listFiles().foreach(_.delete()); d.delete()
      }
    }
    o.write.bucketBy(8, "custkey").sortBy("custkey").saveAsTable("b_orders")
    c.write.bucketBy(8, "custkey").sortBy("custkey").saveAsTable("b_customer")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), Seq("custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join still shuffles:\n" + plan.take(1500))
      // result must equal the plain (non-bucketed) join
      assert(joined.count() == o.join(c, Seq("custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
