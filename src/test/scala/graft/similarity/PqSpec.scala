package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** PQ-ADC ledger invariants (q164). The driver check is rows-only
  * (differential recall has no SQL oracle), so the bounds live here. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("q164 recall ledger: bounds hold and mean recall clears the floor") {
    val rows = Pq.q164(spark, dir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (hit, tru, rec) = (r.getInt(1), r.getInt(2), r.getDouble(3))
      assert(tru === 10)
      assert(hit >= 0 && hit <= tru)
      assert(rec >= 0.0 && rec <= 1.0)
      assert(math.abs(rec - hit.toDouble / tru) < 1e-9)
    }
    val mean = rows.map(_.getDouble(3)).sum / rows.length
    // measured 0.82 at sf0.001 (m=8, k=16, shortlist 100) — deterministic
    // pipeline, so the floor is a regression tripwire, not a gamble
    assert(mean >= 0.6, s"mean recall@10 degraded to $mean")
  }

  test("q164 with shortlist >= corpus refines to EXACT brute-force (recall 1.0)") {
    // When every vector reaches the refine stage, the exact re-rank IS
    // annTopK (same rounded-dot kernel, same tie order) — recall must be
    // identically 1.0. Proves the refine kernel agrees with the exact
    // path bit-for-bit; any disagreement (rounding, tie order, a dropped
    // candidate) breaks equality.
    val rows = Pq.q164(spark, dir, shortlistFactor = 1000000).collect()
    assert(rows.length === 20)
    rows.foreach(r => assert(r.getDouble(3) === 1.0,
      s"q_id=${r.getLong(0)} recall=${r.getDouble(3)}"))
  }

  test("q167 IVF-PQ: bounds hold, and probing EVERY cell degenerates to q164's full-scan ledger") {
    val ivf = Pq.q167(spark, dir).collect()
    assert(ivf.length === 20)
    ivf.foreach { r =>
      assert(r.getInt(2) === 10)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // nprobe = cells ⇒ the candidate set is the whole corpus, so the
    // composed index must reproduce q164's ledger row-for-row — the
    // pruning layer and the pricing layer are independently correct
    val full = Pq.q167(spark, dir, cells = 10, nprobe = 10)
      .collect().map(_.toSeq).toSeq
    val flat = Pq.q164(spark, dir).collect().map(_.toSeq).toSeq
    assert(full === flat, "nprobe=cells IVF-PQ must equal full-scan PQ")
  }
}
