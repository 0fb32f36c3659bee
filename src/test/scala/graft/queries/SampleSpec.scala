package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTest

/** q192 priority-sampling invariants. Value-level correctness of the
  * sample ledger is oracle-gated (q192 in Verify); these pin the
  * SEMANTICS the oracle can't see — the Duffield–Lund–Thorup subset-sum
  * estimator's accuracy and its exactness anchor, and the size-biased
  * inclusion property that is the sampler's whole point. */
class SampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("q192 sample is the top-k by priority, ranks dense, size-biased") {
    val rows = Curation.q192(spark, dir, k = 300).collect()
    assert(rows.length === 300)
    assert(rows.map(_.getLong(0)).toSeq === (1L to 300L), "dense ranks")
    val pris = rows.map(_.getDouble(4))
    assert(pris.zip(pris.tail).forall { case (a, b) => a >= b },
      "rank order must follow priority desc")
    // size-biased inclusion: P(in sample) grows with n_chars, so the
    // sample's mean size must exceed the corpus mean by a clear margin
    val sampleMean = rows.map(_.getLong(3)).sum.toDouble / rows.length
    val corpusMean = spark.read.parquet(s"$dir/documents.parquet")
      .agg(avg(col("n_chars"))).head.getDouble(0)
    assert(sampleMean > corpusMean * 1.05,
      s"sample mean $sampleMean not size-biased vs corpus $corpusMean")
  }

  test("q192 DLT estimator: unbiased subset sums within tolerance at k=300") {
    // measured on this fixture: total ratio 0.983, worst per-source
    // rel-err 0.204 — bounds set at ~2x the measured values so a
    // kernel regression (e.g. a non-uniform u, the bug this spec was
    // born from: a single Lehmer step on consecutive ids never wraps
    // the modulus and inflated every estimate ~90x) fails LOUDLY while
    // re-rolls of the fixture stay green
    val est = Curation.q192Estimate(spark, dir, k = 300).collect()
    assert(est.nonEmpty)
    val totExact = est.map(_.getDouble(1)).sum
    val totEst = est.map(_.getDouble(2)).sum
    assert(math.abs(totEst - totExact) / totExact < 0.05,
      s"corpus-total estimate off by ${math.abs(totEst - totExact) / totExact}")
    est.foreach { r =>
      val rel = math.abs(r.getDouble(2) - r.getDouble(1)) / r.getDouble(1)
      assert(rel < 0.45,
        s"${r.getString(0)}: per-source rel-err $rel out of tolerance")
    }
  }

  test("q192 DLT estimator: k >= N collapses to the EXACT per-source sums") {
    // when the whole corpus fits in the sample, tau = 0 and
    // max(w, tau) = w — the estimator must be bit-exact, not just close
    val est = Curation.q192Estimate(spark, dir, k = 1000000).collect()
    est.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(1),
        s"${r.getString(0)}: k>=N estimate ${r.getDouble(2)} != exact ${r.getDouble(1)}")
    }
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(est.map(_.getLong(3)).sum === n, "k>=N sample must be the corpus")
  }

  test("q208 quotas are the exact Hamilton apportionment, picks fill them, partition-count invariant") {
    val rows = Curation.q208(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = rows.map(_._2).sum
    val target = n * 10 / 100
    // the whole point: the TOTAL is exact, not binomial
    assert(rows.map(_._3).sum === target,
      s"quotas must sum to ⌊N·pct/100⌋ = $target")
    // Hamilton quotas never stray more than one seat from proportional
    rows.foreach { case (src, nd, q, _) =>
      val exact = target.toDouble * nd / n
      assert(math.abs(q - exact) < 1.0,
        s"$src quota $q vs proportional $exact — not a largest-remainder split")
    }
    // the two-pass rank fills every quota exactly
    rows.foreach { case (src, _, q, got) =>
      assert(got === q, s"$src picked $got of quota $q")
    }
    // boundary placement must not leak into the pick set
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      val runs = Seq("3", "5").map { p =>
        spark.conf.set(key, p)
        Curation.q208(spark, dir).collect().map(_.toSeq).toSeq
      }
      assert(runs(0) == runs(1), "q208 depends on partition count")
    } finally spark.conf.set(key, saved)
  }
}
