package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType}

import graft.core.Tables
import graft.functions.TokenHashExpr.tokenHash

/** Statistical-inference operators — the analytics an experimentation or
  * data-quality team runs ON TOP of the corpus ledgers: a Benford
  * first-digit conformance audit, a Kaplan–Meier survival curve with
  * censoring, and a two-proportion A/B significance test. All public
  * textbook statistics (Benford 1938; Kaplan & Meier 1958, JASA;
  * standard two-proportion z), expressed with the repo's exactness
  * discipline: integer tallies, shared double LITERALS for the
  * distributional constants, the q157 8dp-DECIMAL lane for transcendental
  * terms, and one final rounding — so every statistic is replayed
  * bit-for-bit by the DuckDB oracle.
  */
object Stats {
  import Tables.{apply => t}

  private def dec8(c: Column) = round(c, 8).cast(DecimalType(18, 8))

  /** log10(1 + 1/d) for d = 1..9 — shared literals, not each engine's
    * own log10. */
  private val BenfordP = Seq(
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514)

  /** q234 — BENFORD first-digit audit over order totals: the classic
    * fabricated-data / corruption screen (a genuinely transaction-like
    * amount column follows log-uniform leading digits; a synthesized or
    * truncated one doesn't). Output is the per-digit ledger — observed
    * count, observed share, the Benford expectation, and the χ²
    * contribution — the row set an anomaly reviewer thresholds on.
    *
    * Exactness: the leading digit is taken from the STRING rendering of
    * the integer cents (no log10 on doubles, whose edge behavior at
    * powers of ten differs between libms); shares and χ² terms divide
    * exact integers against the shared literal expectations in one
    * pinned operation order. Scale shape: one scan → 9-group aggregate,
    * a 1-row broadcast total, map-side everything. */
  def q234(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100.0, 0).cast(LongType)
    val digits = t(spark, dir, "orders")
      .select(substring(cents.cast("string"), 1, 1).cast(IntegerType)
        .as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum(col("n_obs")).as("t"))
    val expShare = BenfordP.zipWithIndex
      .foldRight(lit(null).cast(DoubleType): Column) {
        case ((p, i), rest) => when(col("digit") === (i + 1), p).otherwise(rest)
      }
    val tD = col("t").cast(DoubleType)
    val dev = col("n_obs").cast(DoubleType) - tD * col("exp_share")
    digits.crossJoin(broadcast(tot))
      .withColumn("exp_share", expShare)
      .select(col("digit"), col("n_obs"),
        round(col("n_obs").cast(DoubleType) / tD, 6).as("obs_share"),
        col("exp_share"),
        round(dev * dev / (tD * col("exp_share")), 6).as("chi2_term"))
      .orderBy(col("digit"))
  }

  /** q235 — KAPLAN–MEIER survival of click→purchase conversion with
    * right-censoring at a 72-hour horizon: per user, the first purchase
    * at or after the first click defines the event time (in whole
    * hours); users who never convert, or convert past the horizon, are
    * CENSORED at 72 h — the estimand funnel metrics (q101) silently get
    * wrong, because treating censored users as non-converters biases
    * conversion down and dropping them biases it up. Output is the full
    * risk-set ledger per distinct observed hour: at-risk count, events,
    * censorings, and the survival estimate S(t) = Π (1 − dᵤ/nᵤ).
    *
    * Exactness: event times and risk sets are pure integer arithmetic
    * (micros DIV 3600·10⁶); the product runs in log space through the
    * q157 8dp-DECIMAL lane (term = ln((n−d)/n), exact cumulative sum,
    * one exp + 6dp round); a depleted risk set (d = n) pins S to 0
    * from that hour on rather than feeding ln(0).
    *
    * Scale shape: two user-keyed aggregates build (user, obs, event);
    * one groupBy reduces to ≤ horizon+1 rows; the cumulative windows
    * run over that value-domain-bounded table only (the q217
    * argument). */
  def q235(spark: SparkSession, dir: String, horizonH: Int = 72)
      : DataFrame = {
    val HourUs = 3600000000L
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        graft.streaming.EventStreams.epochMicros(col("ts")).as("us"))
    val fc = e.where(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("us")).as("c"))
    val fp = fc.join(
        e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("us")),
        Seq("user_id"))
      .where(col("us") >= col("c"))
      .groupBy(col("user_id")).agg(min(col("us")).as("p"))
    val obs = fc.join(fp, Seq("user_id"), "left_outer")
      .select(col("user_id"),
        expr(s"(p - c) DIV $HourUs").as("dur"))
      .select(
        when(col("dur").isNotNull && col("dur") <= horizonH, col("dur"))
          .otherwise(lit(horizonH.toLong)).as("t_h"),
        (col("dur").isNotNull && col("dur") <= horizonH).as("event"))
    val perT = obs.groupBy(col("t_h")).agg(
      sum(when(col("event"), 1L).otherwise(0L)).as("n_events"),
      sum(when(col("event"), 0L).otherwise(1L)).as("n_censored"))
    val tot = perT.agg(sum(col("n_events") + col("n_censored")).as("nc"))
    val w = Window.orderBy(col("t_h"))
    val before = w.rowsBetween(Window.unboundedPreceding, -1)
    val upTo = w.rowsBetween(Window.unboundedPreceding, 0)
    val ranked = perT.crossJoin(broadcast(tot))
      .withColumn("n_risk", col("nc") -
        coalesce(sum(col("n_events") + col("n_censored")).over(before),
          lit(0L)))
      .withColumn("depleted", col("n_events") === col("n_risk"))
      .withColumn("term",
        when(col("n_events") > 0 && !col("depleted"),
          dec8(log((col("n_risk") - col("n_events")).cast(DoubleType) /
            col("n_risk").cast(DoubleType))))
          .otherwise(dec8(lit(0.0))))
    ranked
      .select(col("t_h"), col("n_risk"), col("n_events"), col("n_censored"),
        when(sum(when(col("depleted"), 1L).otherwise(0L)).over(upTo) > 0,
          lit(0.0))
          .otherwise(
            round(exp(sum(col("term")).over(upTo).cast(DoubleType)), 6))
          .as("survival"))
      .orderBy(col("t_h"))
  }

  /** q236 — two-proportion A/B z-test on purchase conversion: users are
    * hash-split into two arms (the splitmix64 coin — assignment must be
    * a pure function of the user key so retries, replays, and the
    * oracle all agree), conversion is "heavy purchaser" — purchases
    * exceed 20 % of the user's events (an any-purchase bit saturates on
    * this dense fixture, making the z path vacuous) — and the
    * report is the standard pooled two-proportion z with the 1.96
    * two-sided gate. On a hash-split of ONE population the true lift is
    * zero, so the honest expectation — which the spec pins — is an
    * insignificant z: this query is the harness an experimentation
    * pipeline points at a REAL treatment column, verified end-to-end on
    * the null case.
    *
    * Exactness: integer arm tallies; rates, the pooled proportion, and
    * z divide exact integers in one pinned operation order, 6dp final.
    * Scale shape: one user-keyed aggregate, one 2-group aggregate, one
    * 1-row projection. */
  def q236(spark: SparkSession, dir: String): DataFrame = {
    val users = t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg((lit(5L) *
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        > count(lit(1))).as("conv"))
      .select(col("conv"),
        pmod(tokenHash(concat(lit("ab|"), col("user_id").cast("string"))),
          lit(2L)).as("arm"))
    val arms = users.agg(
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0L && col("conv"), 1L).otherwise(0L))
        .as("conv_a"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 1L && col("conv"), 1L).otherwise(0L))
        .as("conv_b"))
    def d(c: Column) = c.cast(DoubleType)
    val pPool = (d(col("conv_a")) + d(col("conv_b"))) /
      (d(col("n_a")) + d(col("n_b")))
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b"))))
    val z = (d(col("conv_a")) / d(col("n_a")) -
      d(col("conv_b")) / d(col("n_b"))) / se
    arms.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      when(col("n_a") > 0,
        round(d(col("conv_a")) / d(col("n_a")), 6)).as("rate_a"),
      when(col("n_b") > 0,
        round(d(col("conv_b")) / d(col("n_b")), 6)).as("rate_b"),
      when(col("n_a") > 0 && col("n_b") > 0 && se > 0.0, round(z, 6))
        .as("z"),
      when(col("n_a") > 0 && col("n_b") > 0 && se > 0.0, abs(z) > 1.96)
        .otherwise(lit(false)).as("significant"))
  }

  /** q237 — CUPED variance reduction (Deng et al. 2013, WSDM,
    * "Improving the sensitivity of online controlled experiments" —
    * public literature): regress each user's experiment-period metric
    * (post-period purchase count) on their PRE-period covariate
    * (purchases in the first 14 days), and report how much metric
    * variance the adjustment y − θ(x − x̄) removes. The companion to
    * q236: the z-test's sensitivity is set by var(y), and CUPED is the
    * standard lever that shrinks it without touching the treatment —
    * reduction = ρ²(x, y), which this ledger reports next to θ.
    *
    * Exactness: the period split keys on integer days from the 1-row
    * broadcast min timestamp; all five sufficient statistics are exact
    * DECIMAL(38) sums (the q228 lane); θ, the variances, and the
    * reduction combine exact integers cast once to double in a pinned
    * operation order.
    *
    * Scale shape: one user-keyed aggregate (map-side partials) to
    * (x, y) per user, one 1-row sufficient-statistics aggregate, one
    * 1-row projection. */
  def q237(spark: SparkSession, dir: String, preDays: Int = 14)
      : DataFrame = {
    val DayUs = 86400000000L
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        graft.streaming.EventStreams.epochMicros(col("ts")).as("us"))
    val t0 = e.agg(min(col("us")).as("t0"))
    val xy = e.crossJoin(broadcast(t0))
      .select(col("user_id"),
        (expr(s"(us - t0) DIV $DayUs") < preDays).as("pre"),
        (col("event_type") === "purchase").as("buy"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("pre") && col("buy"), 1L).otherwise(0L)).as("x"),
        sum(when(!col("pre") && col("buy"), 1L).otherwise(0L)).as("y"))
    val dec = DecimalType(38, 0)
    val s = xy.agg(count(lit(1)).as("n"),
      sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
      sum((col("x") * col("y")).cast(dec)).as("sxy"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"),
      sum((col("y") * col("y")).cast(dec)).as("syy"))
    def d(c: Column) = c.cast(DoubleType)
    val nD = d(col("n"))
    val cov = d(col("n").cast(dec) * col("sxy") - col("sx") * col("sy")) /
      (nD * nD)
    val varx = d(col("n").cast(dec) * col("sxx") - col("sx") * col("sx")) /
      (nD * nD)
    val vary = d(col("n").cast(dec) * col("syy") - col("sy") * col("sy")) /
      (nD * nD)
    s.select(col("n").as("n_users"),
      when(varx > 0.0, round(cov / varx, 6)).as("theta"),
      round(vary, 6).as("var_y"),
      when(varx > 0.0, round(vary - cov * cov / varx, 6)).as("var_adj"),
      when(varx > 0.0 && vary > 0.0,
        round(cov * cov / (varx * vary), 6)).as("var_reduction"))
  }

  /** q238 — MANN–WHITNEY U (Wilcoxon rank-sum) on the q236 hash split:
    * the nonparametric companion to the z-test — compares the full
    * per-user purchase-count DISTRIBUTIONS between arms, not just a
    * thresholded proportion, with the normal approximation and the
    * standard tie correction (counts tie heavily). Same null-case
    * verification contract as q236: on a hash split of one population
    * the gate must stay closed.
    *
    * Scale shape — NO corpus-scale rank anywhere: with ties, every
    * member of a value group shares the midrank `c_v + (t_v + 1)/2`
    * (c_v = members below, t_v = group size), so the rank sum needs
    * only ONE aggregate per distinct metric value plus a cumulative
    * count over that value-domain-bounded table (the q217/q232
    * argument); the tie correction Σ(t³−t) folds over the same rows.
    * Arithmetic is exact integers and exact halves until the final
    * z division (DECIMAL(38) sums — the q228 overflow lane), 6 dp.
    * The oracle replays value-for-value. */
  def q238(spark: SparkSession, dir: String): DataFrame = {
    val users = t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("m"))
      .select(col("m"),
        pmod(tokenHash(concat(lit("ab|"), col("user_id").cast("string"))),
          lit(2L)).as("arm"))
    val perV = users.groupBy(col("m")).agg(
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("ta"),
      count(lit(1)).as("t"))
    val w = Window.orderBy(col("m"))
    val dec = DecimalType(38, 0)
    // 2·R_A = Σ_v ta_v · (2·c_v + t_v + 1): midranks doubled so every
    // term is an exact integer
    val agg = perV
      .withColumn("c", coalesce(sum(col("t"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .agg(
        sum(col("ta").cast(dec)).as("na"),
        sum((col("t") - col("ta")).cast(dec)).as("nb"),
        sum((col("ta") * (lit(2L) * col("c") + col("t") + 1L)).cast(dec))
          .as("ra2"),
        sum((col("t") * col("t") * col("t") - col("t")).cast(dec))
          .as("ties"))
    def d(c: Column) = c.cast(DoubleType)
    val u = (d(col("ra2")) - d(col("na")) * (d(col("na")) + 1.0)) / 2.0 -
      d(col("na")) * d(col("nb")) / 2.0 // U − μ_U, exact halves
    val nTot = d(col("na")) + d(col("nb"))
    val sigma2 = d(col("na")) * d(col("nb")) / 12.0 *
      ((nTot + 1.0) - d(col("ties")) / (nTot * (nTot - 1.0)))
    val z = u / sqrt(sigma2)
    agg.select(
      col("na").cast(LongType).as("n_a"), col("nb").cast(LongType).as("n_b"),
      round((d(col("ra2")) - d(col("na")) * (d(col("na")) + 1.0)) / 2.0, 1)
        .as("u_a"),
      when(sigma2 > 0.0, round(z, 6)).as("z"),
      when(sigma2 > 0.0, abs(z) > 1.96).otherwise(lit(false))
        .as("significant"))
  }

  /** q242 — SEASONAL DECOMPOSITION of event volume: the two-way
    * additive model `n(day,hour) ≈ hourEffect + weekdayEffect − grand`
    * over the ZERO-FILLED (day × 24h) grid, with the residual as the
    * deseasonalized anomaly signal. q98 flags hot hours against a flat
    * baseline; this is the honest version — a Monday-9am spike is only
    * an anomaly relative to what Mondays at 9am usually look like.
    *
    * Exactness: cell counts are integers over a zero-filled grid (the
    * day spine is the CONTINUOUS min..max day range — missing days are
    * real zeros, not absent rows; both engines derive the same spine
    * from the same min/max aggregate); each of the three means divides
    * exact integers once; expected/residual combine those doubles in
    * one pinned order, 6 dp. Weekday is `(day + 4) mod 7` — pure
    * integer (1970-01-01 was a Thursday), no calendar library.
    *
    * Scale shape: one (day, hour) aggregate reduces the stream; the
    * grid and every mean are bounded by days×24; the spine explode and
    * the three effect joins are grid-sized. At any event volume the
    * corpus-scale work is the first aggregate. */
  def q242(spark: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400000000L
    val HourUs = 3600000000L
    val e = t(spark, dir, "events")
      .select(graft.streaming.EventStreams.epochMicros(col("ts")).as("us"))
      .select(expr(s"us DIV $DayUs").as("day"),
        expr(s"(us DIV $HourUs) % 24").as("hour"))
    val counts = e.groupBy(col("day"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val span = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .select(col("day"), explode(expr("sequence(0L, 23L)")).as("hour"))
      .join(counts, Seq("day", "hour"), "left_outer")
      .select(col("day"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        pmod(col("day") + 4L, lit(7L)).as("dow"))
    def d(c: Column) = c.cast(DoubleType)
    val hm = grid.groupBy(col("hour"))
      .agg((d(sum(col("n"))) / d(count(lit(1)))).as("hm"))
    val wm = grid.groupBy(col("dow"))
      .agg((d(sum(col("n"))) / d(count(lit(1)))).as("wm"))
    val g = grid.agg((d(sum(col("n"))) / d(count(lit(1)))).as("g"))
    grid.join(hm, Seq("hour")).join(wm, Seq("dow"))
      .crossJoin(broadcast(g))
      .select(col("day"), col("hour"), col("n").as("n_events"),
        round(col("hm") + col("wm") - col("g"), 6).as("expected"),
        round(d(col("n")) - (col("hm") + col("wm") - col("g")), 6)
          .as("residual"))
      .orderBy(col("day"), col("hour"))
  }

  /** The shared empirical-CDF comparison table for q245/q246: per-doc
    * token counts split into the REF (standing) and CUR (incoming)
    * slices by q191's md5 selector, reduced to one row per DISTINCT
    * value with both slices' cumulative counts and the gap to the next
    * value. Value-domain bounded (≤ one row per distinct document
    * length — the q217/q232 argument), so the cumulative windows never
    * see corpus-sized input. */
  private def tokenCdf(spark: SparkSession, dir: String): DataFrame = {
    val pv = t(spark, dir, "documents")
      .select(size(graft.text.TextAnalysis.toks(col("text")))
        .cast(LongType).as("v"), Audit.q191IsCur.as("cur"))
      .groupBy(col("v"))
      .agg(sum(when(!col("cur"), 1L).otherwise(0L)).as("a"),
        sum(when(col("cur"), 1L).otherwise(0L)).as("b"))
    val tot = pv.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
    val w = Window.orderBy(col("v"))
    val upTo = w.rowsBetween(Window.unboundedPreceding, 0)
    pv.select(col("v"),
        sum(col("a")).over(upTo).as("ca"),
        sum(col("b")).over(upTo).as("cb"),
        lead(col("v"), 1).over(w).as("nv"))
      .crossJoin(broadcast(tot))
  }

  /** The |CDF_ref − CDF_cur| gap at one value row — exact integer
    * cumulatives, two divisions in pinned order. */
  private def cdfDiff: Column =
    abs(col("ca").cast(DoubleType) / col("na").cast(DoubleType) -
      col("cb").cast(DoubleType) / col("nb").cast(DoubleType))

  /** q245 — WASSERSTEIN-1 drift between the standing and incoming
    * slices' length distributions: the earth-mover distance
    * ∫|CDF_ref − CDF_cur| — "how many token-positions does a document
    * length shift on average" — the drift metric with UNITS, where
    * q191's PSI is a unitless log score that saturates on disjoint
    * bins. Closed form on 1-D empirical CDFs: Σ over distinct values
    * of |ΔCDF|·(next value − value). Each term enters the 8dp-DECIMAL
    * lane (exact, order-independent sum), one 6 dp rounding. */
  def q245(spark: SparkSession, dir: String): DataFrame =
    tokenCdf(spark, dir)
      .where(col("nv").isNotNull)
      .groupBy(col("na"), col("nb"))
      .agg(sum(dec8(cdfDiff * (col("nv") - col("v")).cast(DoubleType)))
        .as("w18"))
      .select(col("na").as("n_ref"), col("nb").as("n_cur"),
        round(col("w18").cast(DoubleType), 6).as("w1"))

  /** q246 — two-sample KOLMOGOROV–SMIRNOV test on the same split:
    * D = max|CDF_ref − CDF_cur|, gated at the asymptotic 5 % critical
    * value 1.36·√((n₁+n₂)/(n₁·n₂)) (the 1.36 is a shared literal).
    * The distribution-free companion to q236/q238: no binning choice
    * (PSI), no moment assumptions (z). On the md5 hash split the two
    * slices are samples of ONE population, so the honest expectation —
    * spec-pinned like q236's — is an insignificant D. */
  def q246(spark: SparkSession, dir: String): DataFrame = {
    def d(c: Column) = c.cast(DoubleType)
    tokenCdf(spark, dir)
      .groupBy(col("na"), col("nb"))
      .agg(max(cdfDiff).as("dmax"))
      .select(col("na").as("n_ref"), col("nb").as("n_cur"),
        round(col("dmax"), 6).as("d_stat"),
        round(lit(1.36) *
          sqrt((d(col("na")) + d(col("nb"))) /
            (d(col("na")) * d(col("nb")))), 6).as("threshold"),
        (col("dmax") > lit(1.36) *
          sqrt((d(col("na")) + d(col("nb"))) /
            (d(col("na")) * d(col("nb"))))).as("significant"))
  }
}
