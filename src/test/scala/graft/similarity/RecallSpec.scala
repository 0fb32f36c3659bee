package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q76 recall-accounting invariants: the differential is rows-only at the
  * driver, so the bounds live here. */
class RecallSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("recall@k is well-formed: one row per query, recall in [0,1], n_true = k") {
    val rows = Similarity.q76(spark, dir, k = 5, nQueries = 8, cells = 5,
        iters = 2, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(rows.length == 8)
    assert(rows.map(_._1).toSeq == (0L until 8L))
    rows.foreach { case (q, hit, tru, rec) =>
      assert(tru == 5, s"q$q: brute top-k short ($tru)")
      assert(hit >= 0 && hit <= tru)
      assert(rec >= 0.0 && rec <= 1.0)
      assert(rec == BigDecimal(hit.toDouble / tru)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("probing every cell recovers brute-force exactly (recall 1.0)") {
    val cells = 5
    val rows = Similarity.q76(spark, dir, k = 5, nQueries = 8, cells = cells,
        iters = 2, nprobe = cells)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    rows.foreach { case (q, rec) =>
      assert(rec == 1.0, s"query $q: recall $rec != 1.0 with nprobe = #cells")
    }
  }
}
