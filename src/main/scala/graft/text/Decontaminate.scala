package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Benchmark decontamination: flag training documents whose token n-grams
  * overlap a held-out evaluation set — the standard pre-training hygiene
  * step (an eval question leaking into the training corpus inflates the
  * benchmark score without improving the model).
  *
  * Semantics: the held-out set is the deterministic slice
  * `doc_id % benchMod == 0` (in production it would be the benchmark
  * corpus itself); a training document is contaminated when ≥ 5% of its
  * DISTINCT token 3-grams appear anywhere in the held-out set.
  *
  * 100 TB shape: the eval side of a decontamination join is always tiny
  * (benchmarks are thousands of documents, the corpus is billions), so the
  * distinct benchmark-gram set is BROADCAST and the training side never
  * shuffles its grams — the per-doc aggregate re-groups by doc_id, a key
  * the gram explosion preserves, and Spark plans a map-side partial first.
  * The only wide exchange is the (doc_id, gram) distinct, keyed by the
  * PAIR so a boilerplate gram cannot hot-spot one reducer.
  *
  * The contamination flag is decided in integer arithmetic
  * (`n_hit · 20 ≥ n_grams` ⇔ frac ≥ 0.05) so threshold ties cannot split
  * on float rounding between engines.
  */
object Decontaminate {

  /** Distinct (doc_id, gram) token-3-gram pairs of `documents`, ASCII
    * tokenizer dialect (SURVEY §2.4 conv. 5). Gram construction is the
    * q75 in-row pattern: 1-based element_at over a start-position
    * sequence, built per row inside codegen. */
  def docGrams(spark: SparkSession, dir: String, n: Int = 3): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z]+"), w => w =!= "").as("tk"))
      .where(size(col("tk")) >= n)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("tk")) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(d => element_at(col("tk"), i + d)): _*)))
        .as("g"))
      .distinct()

  /** q86 — per-training-document contamination report against the held-out
    * slice: distinct-3-gram count, hits in the held-out set, hit fraction,
    * and the ≥5% contamination flag. */
  def q86(spark: SparkSession, dir: String, benchMod: Int = 50): DataFrame = {
    val grams = docGrams(spark, dir)
    val bench = grams.where(col("doc_id") % benchMod === 0)
      .select(col("g")).distinct()
    val train = grams.where(col("doc_id") % benchMod =!= 0)
    train
      .join(broadcast(bench.withColumn("hit", lit(1))), Seq("g"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0))).cast(LongType).as("n_hit"))
      .select(
        col("doc_id"), col("n_grams"), col("n_hit"),
        round(col("n_hit").cast(DoubleType) / col("n_grams"), 4).as("hit_frac"),
        (col("n_hit") * 20L >= col("n_grams")).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** q141 — train/validation SPLIT-LEAKAGE audit: where q86 screens the
    * corpus against an external benchmark, this audits the pipeline's OWN
    * split (q45's deterministic 90/10 buckets) for memorizable overlap —
    * a validation doc "leaks" if it shares a RARE token-5-gram
    * (document frequency ≤ 2 corpus-wide) with any training doc. Rare
    * grams are the signal: common grams are language, rare ones are
    * near-copies — df ≤ 2 means the gram exists in exactly this
    * validation doc and one other place.
    *
    * Scale shape: one distinct-gram aggregate (corpus-scale, map-side
    * partials), ONE df aggregate OF the gram table that carries the
    * train-presence flag alongside the count (r13: `max(is_train)` in
    * the same gram-keyed aggregate — formerly a separate distinct +
    * left-outer probe branch, i.e. a third pass over the gram stream),
    * then a single gram-keyed probe by the validation rows — the q86
    * decontamination shape pointed at the split instead of a benchmark.
    * Per-key fan-out is bounded by the df cap itself (≤ 2 docs per rare
    * gram), so the join can never skew.
    */
  def q141(spark: SparkSession, dir: String,
           n: Int = 5, dfCap: Int = 2): DataFrame = {
    val split100 = (col("doc_id") * 48271L) % 2147483647L % 100
    val grams = docGrams(spark, dir, n)
      .withColumn("is_train", split100 < 90)
    val rare = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("df"),
        max(when(col("is_train"), 1).otherwise(0)).as("in_train"))
      .where(col("df") <= dfCap)
      .select(col("g"), col("in_train"))
    grams.where(!col("is_train"))
      .join(rare, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_rare_grams"),
        sum(col("in_train")).cast(LongType).as("n_leaky"))
      .select(col("doc_id"), col("n_rare_grams"), col("n_leaky"),
        round(col("n_leaky").cast(DoubleType) /
          col("n_rare_grams").cast(DoubleType), 6).as("leak_frac"),
        (col("n_leaky") > 0L).as("leaked"))
      .orderBy(col("doc_id"))
  }
}
