package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.functions.TokenHashExpr

/** Model-based quality filtering — the fasttext-shaped tier of a curation
  * pipeline: a linear classifier over HASHED bag-of-words features (the
  * "hashing trick": tokens map to a fixed-size bucket table, collisions
  * intentional, so the model is a flat weight array independent of
  * vocabulary size).
  *
  * The weight table here is synthesized deterministically from the bucket
  * id (no external model file exists in this environment) — but the
  * ENGINE shape is exactly what a real classifier filter runs: per token,
  * hash → bucket → weight lookup → integer accumulate; per document, one
  * summed score and a threshold. Swapping the synthetic `weightOf` for a
  * broadcast float array changes nothing structural.
  *
  * Scale posture: q126 is entirely map-side — the score is a single
  * higher-order `aggregate` over the token array inside one projection,
  * so a 100 TB corpus scores with ZERO shuffles (the only exchange is the
  * presentation sort). Integer weights in [-1000, 1000] keep the
  * accumulation order-independent (bit-stable under any partitioning or
  * retry) and let the DuckDB oracle recompute every score exactly via the
  * portable poly31+splitmix64 token hash ([[TokenHashExpr]]).
  */
object Classifier {

  /** Hashed feature-table size (buckets). Power of two, as a real
    * fasttext-style table would be; small enough that the synthetic
    * weight derivation is cheap, large enough that collisions are rare
    * on the fixture vocabulary. */
  val NumBuckets = 4096L

  /** Weights are integers in [-1000, 1000] — "milliweights". Integer
    * sums are associative/commutative exactly, so the per-doc score is
    * deterministic under partial aggregation in any order. */
  val WeightSpan = 2001L

  /** Feature bucket of a token: portable 64-bit hash, reduced mod the
    * table size (pmod: always non-negative). */
  def bucketOf(word: Column): Column =
    pmod(TokenHashExpr.tokenHash(word), lit(NumBuckets))

  /** Synthetic-but-deterministic weight of a bucket: re-hash the bucket
    * id through the same portable kernel (domain-separated with a "w#"
    * prefix) and map into [-1000, 1000]. Stands in for the trained
    * weight array; DuckDB recomputes it losslessly. */
  def weightOf(bucket: Column): Column =
    pmod(TokenHashExpr.tokenHash(concat(lit("w#"), bucket.cast(StringType))),
      lit(WeightSpan)) - lit(1000L)

  /** Per-document classifier features: token count and the integer score
    * sum, computed in ONE map-side projection (no explode, no shuffle) —
    * the token array folds through `aggregate` with the hash → bucket →
    * weight chain applied per element. */
  def scored(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(
        col("doc_id"), col("source"),
        size(TextAnalysis.toks(col("text"))).cast(IntegerType).as("n_toks"),
        aggregate(
          TextAnalysis.toks(col("text")),
          lit(0L),
          (acc, w) => acc + weightOf(bucketOf(w))).as("score_sum"))

  /** q126 — hashed-linear quality-classifier filter: every document gets
    * an exact integer score (sum of its tokens' bucket weights), a mean
    * score rounded once at presentation, and a keep decision
    * (score_sum > 0, i.e. mean weight above the zero threshold).
    * Zero-token documents score NULL and are dropped (kept = 0).
    *
    * Plan: scan → one projection → sort. Nothing else. */
  def q126(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir)
      .select(
        col("doc_id"), col("n_toks"), col("score_sum"),
        when(col("n_toks") > 0,
          round(col("score_sum").cast(DoubleType) /
            col("n_toks").cast(DoubleType), 6)).as("score"),
        when(col("score_sum") > 0, 1).otherwise(0)
          .cast(IntegerType).as("kept"))
      .orderBy(col("doc_id"))

  /** q127 — per-source quality cap: keep at most `k` documents per source,
    * the best-scoring first (score_sum desc, doc_id asc tiebreak) — the
    * "cap each domain's contribution" rule web-scale curation applies so
    * no single source floods the mix even if all its pages score well.
    *
    * Runs on the bounded [[graft.functions.TopKAggregator]] (the q42/q118
    * posture), NOT a rank window: buffers never exceed k entries and merge
    * associatively, so partial aggregation combines map-side and each of
    * the P input partitions ships ≤ k rows per source — a source with a
    * billion documents costs the shuffle k rows, where a window
    * partitioned by a low-cardinality source column would funnel the
    * whole source through one task. Oracle: ROW_NUMBER window. */
  def q127(spark: SparkSession, dir: String, k: Int = 15): DataFrame = {
    import spark.implicits._
    val agg = new graft.functions.TopKAggregator(k)
    scored(spark, dir)
      .select(col("source"), col("doc_id"), col("score_sum"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("top"))
      .toDF("source", "top")
      .select(col("source"), posexplode(col("top")))
      .select(
        col("source"),
        (col("pos") + 1).cast(IntegerType).as("rank"),
        col("col._1").as("doc_id"),
        col("col._2").as("score_sum"))
      .orderBy(col("source"), col("rank"))
  }

  /** q128 — token-budget mixture planner: given a total training budget
    * `budget` (tokens) and a sampling temperature of α = 0.5 (the
    * "sqrt-scaling" mixture every multilingual/multi-source recipe uses
    * to up-weight small sources), compute each source's target token
    * count, its repeat factor (epochs over its available tokens), and the
    * effective tokens after capping repetition at `maxEpochs` (repeating
    * a small source more than a few times stops helping).
    *
    * Arithmetic is exact end-to-end: per-source token counts are integer
    * sums; the α = 0.5 weight is floor(sqrt(n_tokens)) — sqrt is
    * correctly-rounded IEEE in both engines, and the floor makes the
    * weight an integer so the normalizing total is order-independent;
    * target allocation is integer `DIV`; only the two presentation
    * ratios (share, epochs) divide as doubles, each rounded once.
    *
    * Plan: one partial-aggregated groupBy(source) at corpus scale, then
    * arithmetic on a source-count-sized table with the 1-row weight
    * total broadcast back — nothing downstream of the first aggregate
    * touches corpus-scale data. */
  def q128(spark: SparkSession, dir: String,
           budget: Long = 2000000L, maxEpochs: Int = 4): DataFrame = {
    val perSource = Tables(spark, dir, "documents")
      .select(col("source"),
        size(TextAnalysis.toks(col("text"))).cast(LongType).as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .withColumn("w", floor(sqrt(col("n_tokens").cast(DoubleType)))
        .cast(LongType))
    val total = perSource.agg(sum(col("w")).as("tw"))
    perSource.crossJoin(broadcast(total))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        round(col("w").cast(DoubleType) / col("tw").cast(DoubleType), 6)
          .as("share"),
        expr(s"CAST($budget * w AS BIGINT) DIV tw").as("target_tokens"))
      .withColumn("epochs",
        round(col("target_tokens").cast(DoubleType) /
          col("n_tokens").cast(DoubleType), 4))
      .withColumn("effective_tokens",
        least(col("target_tokens"), lit(maxEpochs.toLong) * col("n_tokens")))
      .orderBy(col("source"))
  }

  /** q144 — DSIR importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): every non-target
    * document gets the log importance weight log p_target(x) −
    * log p_raw(x) under two hashed-bigram unigram-of-features models —
    * the weight a resampling pass then draws against to tilt the raw
    * corpus toward the target distribution (here: lang = 'en' as the
    * target slice, everything else as raw). Laplace-smoothed (α = 1)
    * over B = 1024 hashed-feature buckets.
    *
    * Numeric discipline is the q94 LM convention: each per-(doc,
    * feature) log term is rounded to 8 dp and cast DECIMAL(18,8) BEFORE
    * summation, so the per-doc sum is exact and order-independent under
    * any partial-aggregation schedule; one final 6 dp round.
    *
    * Scale posture: ONE tokenizing scan builds the (doc, tgt, feature,
    * cnt) table; both LMs are feature-keyed aggregates over it (map-side
    * partials), each at most B = 1024 rows, and ride back as BROADCAST
    * joins — so scoring a 100 TB raw corpus is one corpus-keyed
    * aggregate plus two tiny broadcast lookups, no corpus-scale shuffle
    * beyond the (doc, feature) grouping. The feature hash is the
    * portable poly31+splitmix64 kernel ([[TokenHashExpr]]) so the DuckDB
    * oracle recomputes every bucket, both models, and every weight
    * exactly. */
  def q144(spark: SparkSession, dir: String, buckets: Long = 1024L): DataFrame = {
    // signed pmod == the oracle's unsigned mod only when buckets | 2^64
    // (power of two) — pin the contract (the cmCellsOf convention)
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"q144: buckets $buckets must be a power of two (oracle hash-mod contract)")
    val feats = Tables(spark, dir, "documents")
      .select(col("doc_id"), (col("lang") === "en").as("tgt"),
        TextAnalysis.toks(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), col("tgt"),
        explode(expr(
          """transform(sequence(1, size(tk) - 1),
            |  i -> concat_ws(' ', slice(tk, i, 2)))""".stripMargin)).as("g"))
      .select(col("doc_id"), col("tgt"),
        pmod(TokenHashExpr.tokenHash(col("g")), lit(buckets)).as("f"))
      .groupBy(col("doc_id"), col("tgt"), col("f"))
      .agg(count(lit(1)).as("cnt"))
    val tf = feats.where(col("tgt")).groupBy(col("f"))
      .agg(sum(col("cnt")).as("t"))
    val tT = tf.agg(coalesce(sum(col("t")), lit(0L)).as("bigT"))
    val rf = feats.where(!col("tgt")).groupBy(col("f"))
      .agg(sum(col("cnt")).as("r"))
    val rT = rf.agg(coalesce(sum(col("r")), lit(0L)).as("bigR"))
    val b = buckets.toDouble
    feats.where(!col("tgt"))
      .join(broadcast(rf), Seq("f"))
      .join(broadcast(tf), Seq("f"), "left_outer")
      .crossJoin(broadcast(tT)).crossJoin(broadcast(rT))
      .select(col("doc_id"), col("cnt"),
        round(col("cnt").cast(DoubleType) *
          (log((coalesce(col("t"), lit(0L)).cast(DoubleType) + 1.0) /
               (col("bigT").cast(DoubleType) + b)) -
           log((col("r").cast(DoubleType) + 1.0) /
               (col("bigR").cast(DoubleType) + b))), 8)
          .cast(DecimalType(18, 8)).as("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        round(sum(col("term")).cast(DoubleType), 6).as("logw"))
      .orderBy(col("doc_id"))
  }

  /** The classifier-evaluation join: every document's q126 integer score
    * next to its q147 Gopher-gate pass bit (the rule-based label the
    * cheap classifier is supposed to approximate), with the score
    * quantized into FIXED bins — `(clamp(score+20000 to [0,40000]))
    * DIV 50` ⇒ ≤ 801 bins. The clamp runs BEFORE the division so both
    * engines divide a non-negative integer (Spark `DIV` truncates
    * toward zero, DuckDB `//` floors — they agree only on
    * non-negatives), and the bin domain is FIXED, making every
    * downstream cumulative window value-domain bounded at any corpus
    * size (the q217 argument — raw distinct scores would grow with the
    * corpus). */
  private def scoreVsGate(spark: SparkSession, dir: String): DataFrame =
    scored(spark, dir)
      .select(col("doc_id"), col("score_sum"))
      .join(graft.text.TextAnalysis.gopherDoc(spark, dir)
        .select(col("doc_id"),
          graft.text.TextAnalysis.gopherPass.as("pass")),
        Seq("doc_id"))
      .select(col("score_sum"), col("pass"),
        expr("greatest(0L, least(40000L, score_sum + 20000L)) DIV 50")
          .as("bin"))

  /** q239 — CLASSIFIER AUC against the rule gate: does the cheap hashed
    * linear score (q126) actually rank documents the way the expensive
    * Gopher rule gate (q147) labels them? AUC is computed by the
    * rank-sum identity AUC = (R₊ − P(P+1)/2)/(P·N) over the BINNED
    * score (fixed 50-unit bins — the defined estimator; within-bin
    * ties contribute ½, exactly the midrank convention), so the
    * computation is one aggregate per bin plus a cumulative count over
    * the ≤ 801-bin table — no corpus-scale rank anywhere (the q238
    * machinery pointed at model evaluation). 2·R₊ stays an exact
    * integer; one final division, 6 dp. AUC ≈ 0.5 means the classifier
    * carries no signal about the gate; the spec pins the measured
    * direction. */
  def q239(spark: SparkSession, dir: String): DataFrame = {
    val perBin = scoreVsGate(spark, dir)
      .groupBy(col("bin")).agg(
        sum(when(col("pass"), 1L).otherwise(0L)).as("p"),
        count(lit(1)).as("t"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
    val dec = DecimalType(38, 0)
    val agg = perBin
      .withColumn("c", coalesce(sum(col("t"))
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)), lit(0L)))
      .agg(
        sum(col("p").cast(dec)).as("np"),
        sum((col("t") - col("p")).cast(dec)).as("nn"),
        count(lit(1)).as("n_bins"),
        sum((col("p") * (lit(2L) * col("c") + col("t") + 1L)).cast(dec))
          .as("rp2"))
    def d(c: Column) = c.cast(DoubleType)
    val auc = (d(col("rp2")) - d(col("np")) * (d(col("np")) + 1.0)) /
      (lit(2.0) * d(col("np")) * d(col("nn")))
    agg.select(col("np").cast(LongType).as("n_pos"),
      col("nn").cast(LongType).as("n_neg"),
      col("n_bins"),
      when(col("np") > 0 && col("nn") > 0, round(auc, 6)).as("auc"))
  }

  /** q240 — RELIABILITY ledger: the per-bin calibration table behind
    * q239's scalar — for each score bin, how many documents land there
    * and what fraction the rule gate passes. The table a threshold
    * reviewer reads before picking q126's cutoff: a monotone pass-rate
    * column means the score is usable as a ranking signal; a flat one
    * means it isn't. One aggregate over ≤ 801 fixed bins; exact counts,
    * two rounded ratios. */
  def q240(spark: SparkSession, dir: String): DataFrame =
    scoreVsGate(spark, dir)
      .groupBy(col("bin")).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
        // exact LONG sum, ONE division — a double avg() would
        // accumulate in partition order
        sum(col("score_sum")).as("ss"))
      .select((col("bin") * 50L - 20000L).as("bin_lo"), col("n_docs"),
        col("n_pass"),
        round(col("n_pass").cast(DoubleType) /
          col("n_docs").cast(DoubleType), 6).as("pass_rate"),
        round(col("ss").cast(DoubleType) /
          col("n_docs").cast(DoubleType), 6).as("mean_score"))
      .orderBy(col("bin_lo"))
}
