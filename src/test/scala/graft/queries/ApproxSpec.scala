package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class ApproxSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("approx_count_distinct within 5% of exact") {
    val exact = Relational.q09(spark, dir).collect()(0)
    val approx = Relational.q38(spark, dir).collect()(0)
    Seq(0, 1).foreach { i =>
      val e = exact.getLong(i).toDouble
      val a = approx.getLong(i).toDouble
      assert(math.abs(a - e) / e <= 0.05, s"col $i: approx $a vs exact $e")
    }
  }
}
