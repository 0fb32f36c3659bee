package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.queries.Relational

/** The SQL entry point (SURVEY §7.5): every table registered as a temp
  * view; `spark.sql` answers the same queries the DataFrame builders do. */
class SqlEntrySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("spark.sql over registered views matches the DataFrame builder (q03 shape)") {
    Tables.registerAll(spark, dir)
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_base,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_disc_price
        |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(_.toSeq).toSeq
    val df = Relational.q03(spark, dir).collect().map(_.toSeq).toSeq
    assert(sql == df)
  }

  test("events view is readable through SQL (nanos handling in loader)") {
    Tables.registerAll(spark, dir)
    val n = spark.sql("SELECT COUNT(*) FROM events WHERE ts IS NOT NULL")
      .collect()(0).getLong(0)
    assert(n > 0)
  }
}
