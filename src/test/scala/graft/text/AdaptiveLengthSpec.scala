package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q130 adaptive length filter: the per-source P5/P95 trim guarantee and
  * the bound/bucket consistency. Cross-engine exactness is gated by the
  * DuckDB oracle. */
class AdaptiveLengthSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("q130 keeps > 90% of every source and bounds agree with kept") {
    val rows = TextAnalysis.q130(spark, dir).collect().map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("lo_tok"),
        r.getAs[Long]("hi_tok"), r.getAs[Int]("kept"))
    }
    rows.foreach { case (id, _, nTok, lo, hi, kept) =>
      assert(lo <= hi, s"doc $id bounds")
      // kept is EXACTLY the interval test — the bucket rule and the
      // published [lo_tok, hi_tok] must agree
      assert(kept == (if (nTok >= lo && nTok <= hi) 1 else 0), s"doc $id")
    }
    rows.groupBy(_._2).foreach { case (src, g) =>
      val keptN = g.count(_._6 == 1)
      assert(keptN * 10 > g.length * 9,
        s"$src trimmed too much: $keptN of ${g.length}")
      // a source has ONE threshold pair
      assert(g.map(r => (r._4, r._5)).distinct.length == 1, s"$src cuts")
    }
  }
}
