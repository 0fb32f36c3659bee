package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.core.Tables

/** Output layout control: at 100 TB the WRITE side has failure modes of
  * its own — a job that emits millions of tiny files (or a handful of
  * 100 GB ones) cripples every downstream reader. Spark's levers:
  * `maxRecordsPerFile` caps file size, `repartition(n)` sets the floor,
  * and `sortWithinPartitions` before write gives each parquet file an
  * internal order (row-group min/max stats become selective → readers
  * skip row groups). */
class OutputLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("maxRecordsPerFile splits oversized partitions at the cap") {
    val out = Files.createTempDirectory("layout").toString + "/o"
    val orders = Tables(spark, dir, "orders")
    val n = orders.count()
    val cap = 100L
    orders.repartition(2)
      .write.option("maxRecordsPerFile", cap).parquet(out)
    val files = new java.io.File(out).listFiles
      .filter(_.getName.endsWith(".parquet"))
    // 2 partitions of ~n/2 rows each split into ceil((n/2)/cap) files
    assert(files.length >= (n / cap).toInt,
      s"only ${files.length} files for $n rows at cap $cap")
    // no file exceeds the cap
    files.foreach { f =>
      val c = spark.read.parquet(f.getAbsolutePath).count()
      assert(c <= cap, s"${f.getName} holds $c rows > cap $cap")
    }
    // and nothing was lost
    assert(spark.read.parquet(out).count() == n)
  }

  test("sortWithinPartitions before write yields internally ordered files") {
    val out = Files.createTempDirectory("layout").toString + "/o"
    Tables(spark, dir, "orders")
      .repartition(2, col("o_custkey"))
      .sortWithinPartitions(col("o_orderkey"))
      .write.parquet(out)
    val files = new java.io.File(out).listFiles
      .filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val keys = spark.read.parquet(f.getAbsolutePath)
        .select(col("o_orderkey")).collect().map(_.getLong(0)).toSeq
      assert(keys == keys.sorted, s"${f.getName} not internally sorted")
    }
  }
}
