package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTest

/** q149 KMV sketch: estimator sanity (the value itself is oracle-exact in
  * DuckDB — these pin the SEMANTICS and the small-group exact path). */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("q149 estimates land near truth at k=64 over thousands of keys") {
    val rows = TopKAggregator.q149(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTrue, nKept, est) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nKept === 64L)
      // deterministic value; 0.5 relative tolerance is ~4 sigma for KMV
      // at k=64, slack enough to survive testdata regeneration
      assert(math.abs(est - nTrue) / nTrue < 0.5,
        s"estimate $est too far from $nTrue")
    }
  }

  test("q149 reports exactly when a group is smaller than k") {
    val rows = TopKAggregator.q149(spark, SparkTest.sf0001, k = 100000)
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(1), "sketch holds all keys")
      assert(r.getDouble(3) === r.getLong(1).toDouble, "estimate is exact")
    }
  }
}
