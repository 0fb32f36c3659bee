package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.core.Tables

/** Hive-style partitioned layouts: a filter on the partition column must
  * prune at planning time (PartitionFilters), not scan-and-filter — the
  * difference between reading 1/N and all of a 100 TB table. */
class PartitioningSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("partitionBy write + partition-pruned read") {
    val out = Files.createTempDirectory("part").toString + "/events"
    Tables(spark, dir, "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)

    val one = spark.read.parquet(out).where(col("event_type") === "click")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("event_type"), "no partition pruning:\n" + plan.take(1000))

    // pruned read returns exactly that partition's rows
    val expected = Tables(spark, dir, "events")
      .where(col("event_type") === "click").count()
    assert(one.count() == expected && expected > 0)
  }
}
