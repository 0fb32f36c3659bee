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

  test("q150 set-op estimates track the exact overlap of the key sets") {
    val dir = "/root/testdata/sf0.01"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val sets = li.select(col("l_returnflag"), col("l_partkey")).distinct()
      .collect().groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getLong(1)).toSet }
    val rows = TopKAggregator.q150(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (f1, f2) = (r.getString(0), r.getString(1))
      val (nm, uEst, jEst, iEst) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      val (a, b) = (sets(f1), sets(f2))
      val (tu, ti) = ((a ++ b).size.toDouble, (a & b).size.toDouble)
      assert(nm <= 63L)
      assert(math.abs(uEst - tu) / tu < 0.5, s"union $uEst vs $tu")
      assert(math.abs(jEst - ti / tu) < 0.3, s"jaccard $jEst vs ${ti / tu}")
      if (ti > 0) assert(math.abs(iEst - ti) / ti < 0.6,
        s"intersection $iEst vs $ti")
    }
  }
}
