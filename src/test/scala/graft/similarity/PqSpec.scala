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

  test("q167 IVF-PQ ledger is partition-count invariant (P=3 vs P=5)") {
    // the PQ tier's (s, code, cell) lookup joins and (q, vec) aggregates
    // are the library's newest shuffle shapes — the decimal-exact
    // distance-table/centroid arithmetic means NO result may depend on
    // how those shuffles partition (the repo-wide P-sweep discipline)
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      val runs = Seq("3", "5").map { p =>
        spark.conf.set(key, p)
        Pq.q167(spark, dir).collect().map(_.toSeq).toSeq
      }
      assert(runs(0) == runs(1), "q167 ledger depends on partition count")
      assert(runs(0).nonEmpty)
    } finally spark.conf.set(key, saved)
  }

  test("q177 incremental ingest equals the monolithic rebuild, bit for bit") {
    // The q160 discipline for the ANN tier: with the codebook and coarse
    // cells FROZEN (trained on the standing corpus), encoding is per-row
    // and state-free, so standing-pin ∪ batch-encode must reproduce the
    // one-pass full-corpus encode through the ENTIRE ledger — probe, ADC,
    // refine, recall. Any divergence means the batch path leaked
    // corpus-wide state (and the ingest posture would be a lie at scale).
    val incr = Pq.q177(spark, dir).collect().map(_.toSeq).toSeq
    val mono = Pq.q177Monolithic(spark, dir).collect().map(_.toSeq).toSeq
    assert(incr === mono, "ingest (standing ∪ batch) diverged from rebuild")
    assert(incr.length === 20)
    incr.foreach { r =>
      assert(r(2) === 10)
      val rec = r(3).asInstanceOf[Double]
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }
}
