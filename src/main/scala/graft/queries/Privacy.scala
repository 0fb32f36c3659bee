package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.core.Tables
import graft.functions.TokenHashExpr.tokenHash

/** Privacy-preserving release operators — the governance tier's
  * statistical face. The takedown/erasure family (q179–q186, q220–q225)
  * removes SUBJECTS from data; these two release AGGREGATES about data
  * without exposing individuals: a locally-differentially-private
  * histogram (randomized response — Warner 1965, JASA; the mechanism
  * behind RAPPOR, Erlingsson et al. 2014 CCS — public literature) and a
  * k-anonymity generalization ladder (Sweeney 2002, IJUFKS — public
  * literature). Both are single-pass relational plans whose "noise" is
  * DETERMINISTIC (the engine-portable splitmix64 kernel), so the DuckDB
  * oracle replays them exactly — the q94/q137 discipline applied to a
  * privacy mechanism.
  */
object Privacy {
  import Tables.{apply => t}

  /** q230 — RANDOMIZED-RESPONSE private histogram: per-source counts of
    * a protected-subgroup bit released under local differential privacy.
    * Each document reports its bit TRUTHFULLY with probability 3/4 and
    * FLIPPED with probability 1/4 (ε = ln 3 local DP); the curator
    * debiases the per-source tally with the closed form
    * `est = (4·reported − n) / 2`. The ledger carries the true count as
    * the AUDIT column (what a release would drop) so the oracle and the
    * specs can price the mechanism's error — the q76-recall pattern:
    * every approximate release ships its measured deviation.
    *
    * Determinism: the flip coin is `splitmix64("rr|" ⊕ doc_id) mod 4 == 0`
    * — the portable TokenHashExpr kernel, replayed losslessly by the
    * oracle's HUGEINT chain. A per-doc keyed coin (not a random draw) is
    * exactly how a distributed RR release must work anyway: retries and
    * speculative tasks must not re-flip, so the coin has to be a pure
    * function of the row key. SECURITY NOTE — do not ship as-is: a
    * PRODUCTION release keys the coin with a SECRET salt
    * (`splitmix64(secret ⊕ doc_id)`), because a coin keyed on the public
    * doc_id lets anyone replay the flip and un-noise each row; the
    * public "rr|" prefix here is the oracle-replayable stand-in that
    * keeps the mechanism testable.
    *
    * Scale shape: one map-side expression per row (hash + two booleans),
    * one aggregate over #sources groups. Nothing shuffles but the
    * #sources-row tally. */
  def q230(spark: SparkSession, dir: String): DataFrame = {
    val s = col("lang") === "zh"
    val flip = pmod(tokenHash(concat(lit("rr|"), col("doc_id").cast("string"))),
      lit(4L)) === 0L
    val reported = s =!= flip // XOR: truth 3/4 of the time
    t(spark, dir, "documents")
      .select(col("source"), s.as("s"), reported.as("rep"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s"), 1L).otherwise(0L)).as("true_pos"),
        sum(when(col("rep"), 1L).otherwise(0L)).as("reported_pos"))
      .select(col("source"), col("n_docs"), col("true_pos"),
        col("reported_pos"),
        ((lit(4L) * col("reported_pos") - col("n_docs"))
          .cast(DoubleType) / lit(2.0)).as("est_pos"))
      .withColumn("err",
        col("est_pos") - col("true_pos").cast(DoubleType))
      .orderBy(col("source"))
  }

  /** q231 — K-ANONYMITY generalization ladder over the customer
    * quasi-identifiers (nation, market segment, account-balance
    * bucket): every released equivalence class must contain ≥ k
    * individuals. Classes that violate at the full QI resolution
    * generalize (drop the balance bucket); classes still violating at
    * the coarser level suppress entirely. The output is the release
    * PLAN — one ledger row per released class with its generalization
    * level and size — the artifact a data-sharing review signs off on,
    * and the relational face of the PII tier (q174 scrubs values;
    * this bounds re-identification by group size).
    *
    * Scale shape: two QI-keyed aggregates + one semi join routing
    * violating rows to the next rung — all shuffle-bounded by class
    * cardinality, never by row count; no windows, no collect. */
  def q231(spark: SparkSession, dir: String, k: Long = 5L): DataFrame = {
    val qi = t(spark, dir, "customer").select(col("c_nationkey"),
      col("c_mktsegment"),
      floor(col("c_acctbal") / 1000.0).cast(IntegerType).as("bal_bucket"))
    val g0 = qi.groupBy(col("c_nationkey"), col("c_mktsegment"),
      col("bal_bucket")).agg(count(lit(1)).as("n_rows"))
    val keep0 = g0.where(col("n_rows") >= k)
      .select(lit(0).as("level"), col("c_nationkey"), col("c_mktsegment"),
        col("bal_bucket"), col("n_rows"))
    val escalated = qi.join(
      g0.where(col("n_rows") < k)
        .select(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket")),
      Seq("c_nationkey", "c_mktsegment", "bal_bucket"), "left_semi")
    val g1 = escalated.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_rows"))
    val keep1 = g1.where(col("n_rows") >= k)
      .select(lit(1).as("level"), col("c_nationkey"), col("c_mktsegment"),
        lit(null).cast(IntegerType).as("bal_bucket"), col("n_rows"))
    val suppressed = g1.where(col("n_rows") < k)
      .agg(sum(col("n_rows")).as("n_rows"))
      .where(col("n_rows").isNotNull && col("n_rows") > 0)
      .select(lit(2).as("level"),
        lit(null).cast(IntegerType).as("c_nationkey"),
        lit(null).cast("string").as("c_mktsegment"),
        lit(null).cast(IntegerType).as("bal_bucket"), col("n_rows"))
    keep0.unionByName(keep1).unionByName(suppressed)
      .orderBy(col("level"), col("c_nationkey").asc_nulls_first,
        col("c_mktsegment").asc_nulls_first,
        col("bal_bucket").asc_nulls_first)
  }
}
