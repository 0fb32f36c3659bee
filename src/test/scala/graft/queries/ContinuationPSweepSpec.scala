package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** The repo-wide P-sweep discipline applied in one pass to the round-10
  * continuation wave: every new query's collected output must be
  * bit-identical at P=3 and P=5. The iterative/ranked members carry
  * their own dedicated sweeps (q202/q204/q208/q218); this covers the
  * rest — integer ledgers, decimal sums, pinned-order folds, and join
  * shapes whose determinism claims would otherwise rest on prose.
  * q205 is excluded by design: its write-once layout cache makes the
  * second run a reuse, which the FormatsSpec accounting covers. */
class ContinuationPSweepSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  private val wave = Seq(
    "q201_bloom_join", "q203_secondary_sort", "q206_decayed_ranking",
    "q207_cogroup_reconcile", "q209_editdist_dedup",
    "q210_pmi_collocations", "q211_lateral_topn", "q212_robust_outliers",
    "q213_embedding_drift", "q214_range_frame", "q215_activity_streaks",
    "q216_assoc_rules", "q217_growth_accounting",
    // round-11 continuation: the integer-recurrence graph pair and the
    // decimal-sufficient-statistics profiling pair
    "q226_hits", "q227_seed_distance",
    "q228_feature_corr", "q229_mix_diversity",
    "q230_rr_private_hist", "q231_k_anonymity",
    "q232_skyline", "q233_bootstrap_ci",
    "q234_benford_audit", "q235_survival_km", "q236_ab_test",
    "q237_cuped", "q238_mann_whitney",
    "q239_classifier_auc", "q240_reliability", "q241_item_cf",
    "q242_seasonal_decomp", "q243_license_contagion",
    "q244_incr_item_cf", "q245_wasserstein_drift", "q246_ks_test",
    // round-12: the durable-restart and CF-erasure faces (integer
    // ledgers — partition invariance must survive the parquet reload
    // and the full-outer erasure merge)
    "q247_durable_cf_restart", "q248_erase_cf_state",
    "q249_durable_lpa_restart", "q250_durable_chain",
    // round-12: the evaluation tier (decimal-lane metrics, two-pass
    // rank, bounded-spine windows — each must survive any P)
    "q251_retrieval_eval", "q252_chi_square", "q253_gini_tokens",
    "q254_cusum_drift", "q255_simpson_audit", "q256_jackknife_ratio",
    "q257_rbo_drift", "q258_calibration_ece", "q259_erase_commit")

  test("round-10 continuation wave is partition-count invariant (P=3 vs P=5)") {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      wave.foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        val runs = Seq("3", "5").map { p =>
          spark.conf.set(key, p)
          val df = fn(spark, dir)
          val rows = df.collect().map(_.toSeq).toSeq
          org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(df)
          rows
        }
        assert(runs(0) == runs(1), s"$name depends on partition count")
        assert(runs(0).nonEmpty, s"$name returned nothing at sf0.001")
      }
    } finally spark.conf.set(key, saved)
  }
}
