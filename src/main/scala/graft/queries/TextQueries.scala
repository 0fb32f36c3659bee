package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Text / event-time queries over `documents` and `events` — the direct
  * analogs of the reference's application operators plus the event-window
  * capability (SURVEY.md §2.4 Q17–Q21).
  *
  * - q19 word count     ≙ reference wc       (/root/reference/src/mrapps/wc.go:22-43)
  * - q20 inverted index ≙ reference indexer  (/root/reference/src/mrapps/indexer.go:20-39)
  * - q21 metadata agg   ≙ reference crash map (/root/reference/src/mrapps/crash.go:34-43)
  *
  * Tokenization convention (SURVEY.md §2.4 conv.5): `lower(text)` split on
  * `[^a-z]+`, empty tokens dropped — the deterministic ASCII analog of the
  * reference's `unicode.IsLetter` separator (wc.go:24-27).
  */
object TextQueries {
  import Tables.{apply => t}

  private def dec(c: Column): Column = c.cast(DecimalType(12, 4))
  private def money(c: Column): Column = round(c, 2).cast(DoubleType)

  /** `documents` exploded to one row per (doc_id, token occurrence).
    * The explode stays inside whole-stage codegen (Generate over a split). */
  def tokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .where(col("word") =!= "")

  /** Q18 — tumbling event-time window, batch form (oracle for the streaming
    * variant in graft.streaming). Group by hour bucket + type. */
  def q18(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(
        // TIMESTAMP_NTZ: naive UTC wall-clock, matching DuckDB's timestamp
        // semantics (instant-typed parquet would read back tz-adjusted).
        date_trunc("hour", col("ts")).cast(TimestampNTZType).as("w"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        money(sum(dec(col("value")))).as("v"))
      .orderBy(col("w"), col("event_type"))

  /** Q39 — sliding event-time window (1 h window, 30 min slide): every
    * event lands in exactly two epoch-aligned windows. */
  def q39(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        money(sum(dec(col("value")))).as("v"))
      .select(
        col("window.start").cast(TimestampNTZType).as("w"),
        col("event_type"), col("n"), col("v"))
      .orderBy(col("w"), col("event_type"))

  /** Q40 — session windows via the built-in session_window operator
    * (30 min gap per user); window end = last event + gap. The stateful
    * streaming twin lives in graft.streaming (sessionizeStream). */
  def q40(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("session_window.start").cast(TimestampNTZType).as("s_start"),
        col("session_window.end").cast(TimestampNTZType).as("s_end"),
        col("user_id"), col("n"))
      .orderBy(col("user_id"), col("s_start"))

  /** Q41 — JSON scalar extraction over events.props. */
  def q41(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"),
        col("value"))
      .groupBy(col("k"))
      .agg(
        count(lit(1)).as("n"),
        money(sum(dec(col("value")))).as("v"))
      .orderBy(col("k"))

  /** Q62 — SCHEMA-based JSON parsing (`from_json` + StructType), the
    * typed companion to q41's per-path string extraction: the whole props
    * document parses ONCE into a typed struct column (one Jackson pass
    * regardless of how many fields are read; q41's get_json_object
    * re-parses per path), malformed documents become a null struct
    * (PERMISSIVE mode) and are bucketed separately rather than silently
    * dropped. */
  def q62(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    t(spark, dir, "events")
      .select(from_json(col("props"), schema).as("p"), col("value"))
      .select(
        // sign-following % (not pmod): matches the oracle's % operator
        // even if a future corpus carries negative k
        coalesce(col("p.k") % 10, lit(-1)).as("k_bucket"),
        col("value"))
      .groupBy(col("k_bucket"))
      .agg(
        count(lit(1)).as("n"),
        money(sum(dec(col("value")))).as("v"))
      .orderBy(col("k_bucket"))
  }

  /** q98 — trailing-window anomaly detection: per (event_type, hour),
    * flag hours whose event count exceeds 2× the mean of the trailing 24
    * OBSERVED hours (rows-frame, not range — gaps don't shrink the
    * baseline). The whole query is EXACT integer arithmetic: the spike
    * test is `n · prev_cnt > 2 · prev_sum` (no float threshold to split
    * on), and the reported baseline mean is one final rounded division.
    * Window partitions are per event_type — bounded by that type's hour
    * count, never the corpus. */
  def q98(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = t(spark, dir, "events")
      .groupBy(
        date_trunc("hour", col("ts")).cast(TimestampNTZType).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val trail = Window.partitionBy(col("event_type")).orderBy(col("w"))
      .rowsBetween(-24, -1)
    hourly
      .select(col("w"), col("event_type"), col("n"),
        sum(col("n")).over(trail).as("prev_sum"),
        count(col("n")).over(trail).as("prev_cnt"))
      .where(col("prev_cnt") > 0)
      .select(col("w"), col("event_type"), col("n"),
        round(col("prev_sum").cast(DoubleType) / col("prev_cnt"), 4)
          .as("avg_prev"),
        (col("n") * col("prev_cnt") > col("prev_sum") * 2L).as("spike"))
      .orderBy(col("w"), col("event_type"))
  }

  /** q99 — cohort retention: users bucketed by their FIRST active hour,
    * counted per (cohort, hour-offset) of later activity — the
    * product-analytics staple. Exact counts only: the distinct
    * (cohort, offset, user) set is an explicit pre-distinct then count
    * (one high-cardinality shuffle + one small one), not a
    * countDistinct inside the final aggregate. Hour offsets are integer
    * microsecond arithmetic on hour-truncated timestamps — exact. */
  def q99(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val first = ev.groupBy(col("user_id"))
      .agg(min(date_trunc("hour", col("ts"))).as("cohort"))
    val active = ev
      .select(col("user_id"), date_trunc("hour", col("ts")).as("w"))
      .distinct()
    // rows here are already unique: active is distinct (user, hour) and
    // offset_h is injective in the hour for a fixed user — a second
    // distinct would re-shuffle the whole active set for nothing
    active.join(first, Seq("user_id"))
      .select(
        col("cohort").cast(TimestampNTZType).as("cohort"),
        ((graft.streaming.EventStreams.epochMicros(col("w")) -
          graft.streaming.EventStreams.epochMicros(col("cohort"))) / 3600000000L)
          .cast(LongType).as("offset_h"),
        col("user_id"))
      .groupBy(col("cohort"), col("offset_h"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort"), col("offset_h"))
  }

  /** q101 — ordered conversion funnel: of the users who signed up, how
    * many CLICKED strictly after their first signup, and of those, how
    * many PURCHASED strictly after that click — order matters (a purchase
    * before the click does not count), which plain per-type counts cannot
    * express. Three stage aggregates chained by user-keyed joins, each
    * keeping the stage's earliest qualifying timestamp; every join keys
    * on user_id (evenly spread), every aggregate partials map-side, and
    * the result is three 1-row broadcasts folded into one row of exact
    * counts + rounded conversion rates. */
  def q101(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.where(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .where(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.where(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .where(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    val n1 = s1.agg(count(lit(1)).as("n_signup"))
    val n2 = s2.agg(count(lit(1)).as("n_click_after"))
    val n3 = s3.agg(count(lit(1)).as("n_purchase_after"))
    // degenerate-corpus guard: a zero denominator yields NULL in BOTH
    // engines (Spark `when` with no otherwise; NULLIF in the oracle) —
    // unguarded, DuckDB's IEEE float division would emit inf/NaN where
    // Spark emits NULL
    n1.crossJoin(broadcast(n2)).crossJoin(broadcast(n3))
      .select(
        col("n_signup"), col("n_click_after"), col("n_purchase_after"),
        when(col("n_signup") > 0,
          round(col("n_click_after").cast(DoubleType) / col("n_signup"), 4))
          .as("click_rate"),
        when(col("n_click_after") > 0,
          round(col("n_purchase_after").cast(DoubleType) /
            col("n_click_after"), 4))
          .as("purchase_rate"))
  }

  /** q102 — session journey mining: the top event-type PATHS users take
    * within a session (the "signup>click>purchase" journeys product
    * analytics lives on). Sessions come from the q37 gap formulation
    * (per-user windows, bounded by a user's event count); each session's
    * path is its events' types in (ts, event_id) order — the in-session
    * collect is bounded by session length, the same state bound the
    * stateful streaming sessionizer carries — and identical paths are
    * counted corpus-wide with an ordinary partial-agged groupBy. */
  def q102(spark: SparkSession, dir: String,
           gapMinutes: Int = 30, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val s = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("nsess",
        when(col("prev_ts").isNull ||
          graft.streaming.EventStreams.epochMicros(col("ts")) -
            graft.streaming.EventStreams.epochMicros(col("prev_ts")) >
            gapMinutes * 60L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("nsess")).over(run))
    s.groupBy(col("user_id"), col("sid"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topK)
  }

  /** Q72 — overlapping token-window chunking: each document becomes
    * fixed-size token chunks at a fixed stride (stride < size →
    * overlap) — the pre-tokenization shaping step of every LLM training
    * pipeline. Chunk starts at 0, stride, 2·stride, …; trailing chunks
    * may be short. Pure per-row array math (split → sequence → slice →
    * hash): no shuffle until the final ORDER BY, so it's a map-only pass
    * at any corpus size. */
  def q72(spark: SparkSession, dir: String,
          chunkTokens: Int = 50, stride: Int = 40): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z]+"), w => w =!= "").as("tk"))
      .where(size(col("tk")) > 0)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, int(floor((size(tk) - 1) / $stride))),
           |          s -> slice(tk, s * $stride + 1, $chunkTokens))"""
          .stripMargin)))
      .select(
        col("doc_id"),
        col("pos").cast(IntegerType).as("chunk_id"),
        size(col("col")).cast(IntegerType).as("n_tokens"),
        md5(array_join(col("col"), " ")).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))

  /** Q75 — bigram counts (language-model n-gram statistics): top-100
    * adjacent token pairs. Map-only shaping — the bigram list is built
    * per row from the token array (1-based element_at over a sequence of
    * start positions, the q72 chunking pattern), so nothing shuffles but
    * the final (bigram → count) aggregate. Documents with < 2 tokens are
    * filtered BEFORE the sequence so `sequence(1, size-1)` can never see
    * a descending (1, 0) range. */
  def q75(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z]+"), w => w =!= "").as("tk"))
      .where(size(col("tk")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("tk")) - 1),
        i => concat_ws(" ", element_at(col("tk"), i),
          element_at(col("tk"), i + 1)))).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(100)

  /** Q19 — word count (reference wc): top-100 words by frequency.
    * One shuffle: partial count map-side, final count reduce-side, then a
    * top-k (TakeOrderedAndProject) — no global sort. */
  def q19(spark: SparkSession, dir: String): DataFrame =
    tokens(spark, dir)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(100)

  /** Q20 — inverted index (reference indexer): per word, #docs and the
    * sorted csv of doc ids. `collect_set` dedups partially map-side like the
    * reference's per-doc dedup map (indexer.go:21-28); `sort_array` on the
    * *string* form pins the reference's lexicographic csv (indexer.go:37). */
  def q20(spark: SparkSession, dir: String): DataFrame =
    tokens(spark, dir)
      .groupBy(col("word"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        array_join(sort_array(collect_set(col("doc_id").cast(StringType))), ",").as("docs"))
      .orderBy(col("word"))
      .limit(200)

  /** `documents` tokenized with the REFERENCE-EXACT tokenizer: split on
    * non-letter runes (`[^\p{L}]+`, any Unicode letter), case-PRESERVING —
    * byte-for-byte the wc.go:24-27 / indexer.go:20-28 convention
    * (`unicode.IsLetter` complement), unlike the declared ASCII oracle
    * dialect of `tokens` (SURVEY §2.4 conv. 5: lower + `[^a-z]+`). Java's
    * and RE2's `\p{L}` are both Unicode general-category Letter, so the
    * DuckDB oracle tokenizes identically. */
  def tokensUnicode(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), "[^\\p{L}]+")).as("word"))
      .where(col("word") =!= "")

  /** q81 — q19 word count under the reference-exact Unicode tokenizer
    * (case-preserving `\p{L}` runs). Same plan shape as q19: partial
    * count map-side, one shuffle, top-k. Spec-proven equal to the
    * MR-compat WordCount output on the same corpus. */
  def q81(spark: SparkSession, dir: String): DataFrame =
    tokensUnicode(spark, dir)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(100)

  /** q82 — q20 inverted index under the reference-exact Unicode tokenizer;
    * spec-proven equal to the MR-compat InvertedIndex output on the same
    * corpus (modulo the path-vs-doc_id naming of documents). */
  def q82(spark: SparkSession, dir: String): DataFrame =
    tokensUnicode(spark, dir)
      .groupBy(col("word"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        array_join(sort_array(collect_set(col("doc_id").cast(StringType))), ",").as("docs"))
      .orderBy(col("word"))
      .limit(200)

  /** q79 — q20's inverted index with BOUNDED per-word state: the 100 TB
    * form. q20 is reference-exact (indexer.go:36-39 also collects the full
    * doc set per word) but a stop word's postings group is unbounded —
    * at corpus scale one reducer key holds millions of ids. Here:
    *
    *  1. distinct (word, doc_id) pairs — the dedup shuffle keys on the
    *     PAIR, so a hot word spreads over all partitions;
    *  2. one word-keyed aggregate computing the exact `n_docs` (a count of
    *     the distinct pairs — algebraic, partial-agg'd map-side) and a
    *     CAPPED postings list via TopKAggregator, whose buffer never
    *     exceeds `cap` entries anywhere — map-side partials, shuffle rows,
    *     and the final merge all carry ≤ cap ids per word.
    *
    * Spark's partial aggregation plays the role a salted two-phase
    * (SkewUtils.saltedCollectSet) plays for UNBOUNDED holistic aggregates:
    * with the buffer capped, every partial is already small, so no salt
    * indirection is needed — strictly stronger state bounds than salting.
    *
    * Cap rule: the `cap` numerically-smallest doc ids (deterministic,
    * SQL-expressible → full DuckDB oracle). Postings format matches q20
    * (lexicographic csv of the string ids), so for every word with
    * n_docs ≤ cap the row is IDENTICAL to q20's — spec-asserted. */
  def q79(spark: SparkSession, dir: String, cap: Int = 16): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregator(cap),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]())
    tokens(spark, dir).select(col("word"), col("doc_id")).distinct()
      .groupBy(col("word"))
      .agg(
        count(lit(1)).as("n_docs"),
        // cnt=0 for every input: TopKAggregator orders by (cnt desc, id
        // asc), so a constant count degrades it to bounded min-k ids
        topk(col("doc_id"), lit(0L)).as("top"))
      .select(
        col("word"), col("n_docs"),
        array_join(sort_array(
          transform(col("top"), x => x.getField("_1").cast(StringType))), ",")
          .as("docs"),
        (col("n_docs") > cap).as("truncated"))
      .orderBy(col("word"))
      .limit(200)
  }

  /** Q21 — file/record metadata aggregation (reference crash/nocrash map
    * part: filename, len(filename), len(contents) emissions). */
  def q21(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast(LongType).as("chars"),
        min(col("doc_id")).as("first_doc"))
      .orderBy(col("source"))

  /** Q22 — exact duplicate detection by content hash (north-star dedup,
    * SURVEY.md §2.4 Q21). Hash-groupBy: one shuffle on a 32-byte key
    * regardless of document size — the 100 TB-safe exact-dedup plan. */
  def q22(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(md5(col("text")).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("dups"))
      .where(col("dups") > 1)
      .orderBy(col("h"))

  /** q206 — TIME-DECAYED engagement ranking: per event type, the
    * exponentially-decayed value total (half-life = one week relative to
    * the corpus watermark) beside the raw total — the recency-weighted
    * score every trending/freshness ranker runs on, where last month's
    * engagement counts a fraction of yesterday's.
    *
    * Determinism (the q191 float-ledger discipline, but STRONGER): the
    * decay weight is a pure power of two (value/2^weeks — ldexp, exact
    * in IEEE double, no libm exp/pow in either engine), each term is
    * rounded to 6 dp and summed as DECIMAL(20,6), so the total is
    * order-independent and bit-equal to the DuckDB replay at any
    * partitioning. The watermark is a 1-row max broadcast (the house
    * crossJoin-of-a-scalar pattern).
    *
    * Scale shape: one scan, one 1-row aggregate, one partial-aggregable
    * groupBy on a low-cardinality key — map-side combine does nearly all
    * the work; nothing holistic, no window. */
  def q206(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.EventStreams.epochMicros
    val ev = t(spark, dir, "events")
      .select(col("event_type"), col("value"), epochMicros(col("ts")).as("us"))
    val wm = ev.agg(max(col("us")).as("wm_us"))
    val weekUs = 7L * 86400L * 1000000L
    ev.crossJoin(broadcast(wm))
      .select(col("event_type"), col("value"),
        // whole weeks of age, clamped so 2^wk stays a representable long;
        // DIV so both engines perform INTEGER division structurally (the
        // q214/q215/q217 idiom) instead of double-divide-then-truncate
        least(expr(s"(wm_us - us) DIV $weekUs"), lit(60L))
          .cast(IntegerType).as("wk"))
      .select(col("event_type"), col("value"),
        round(col("value") /
          expr("CAST(SHIFTLEFT(CAST(1 AS BIGINT), wk) AS DOUBLE)"), 6)
          .cast(DecimalType(20, 6)).as("term"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast(DecimalType(18, 4))), 2)
          .cast(DoubleType).as("raw_total"),
        round(sum(col("term")), 4).cast(DoubleType).as("decayed_total"))
      .orderBy(col("event_type"))
  }

  /** q212 — ROBUST OUTLIER LEDGER (median/MAD): per event type, the
    * median, the median absolute deviation, and the count of values
    * beyond the 3σ-equivalent robust fence (|x − med| > 3·1.4826·MAD) —
    * the outlier detector that survives the outliers it hunts, unlike a
    * mean/stddev z-score which the tail itself inflates. The per-family
    * quality-score sanity pass a curation pipeline runs before trusting
    * thresholds.
    *
    * Numerics: both engines interpolate the exact 0.5-quantile with the
    * same lower + frac·(upper−lower) arithmetic over identical doubles,
    * so med, MAD and every fence comparison agree bit-for-bit (the
    * displayed med/MAD round to 4 dp). Scale note: `percentile` is the
    * exact holistic aggregate — per-GROUP state is the group's value
    * multiset, the declared oracle-parity posture (q51's), with q60's
    * GK sketch as the streaming-scale twin and q83's two-pass rank as
    * the exact-at-scale path; group count here is bounded (event
    * types). Two passes over events, medians ride back as a bounded
    * broadcast. */
  def q212(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events").select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), col("med"),
        abs(col("value") - col("med")).as("ad"))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(ad, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(min(col("med")), 4).as("median"),
        round(min(col("mad")), 4).as("mad"),
        sum(when(col("ad") > lit(3.0) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** q214 — RANGE-frame moving aggregate: per event type, the trailing
    * 3-HOUR value total computed with a VALUE-based window frame
    * (`RANGE BETWEEN 2 PRECEDING AND CURRENT ROW` over the hour number)
    * — the frame kind q12's running total (ROWS) cannot express: an
    * hour with no events leaves a hole (30–47 per type in this corpus,
    * spec-asserted non-vacuous), and a ROWS frame would wrongly reach
    * past it into older hours, while RANGE bounds the frame by the HOUR
    * VALUE. The trailing-window health metric every ops dashboard runs.
    *
    * Scale shape: the corpus-sized work is one partial-agged groupBy to
    * HOURLY grain; the window then runs over (types × hours) rows —
    * bounded by the calendar, not the corpus. Hour numbers are integer
    * epoch arithmetic (timezone-free); totals are DECIMAL sums (exact,
    * order-free). */
  def q214(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.streaming.EventStreams.epochMicros
    val daily = t(spark, dir, "events")
      .select(col("event_type"), epochMicros(col("ts")).as("us"),
        col("value"))
      .select(col("event_type"), expr("us DIV 3600000000").as("hourn"),
        col("value"))
      .groupBy(col("event_type"), col("hourn"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 4))).as("tot"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hourn"))
      .rangeBetween(-2, 0)
    daily
      .select(col("event_type"), col("hourn"), col("n_events"),
        round(col("tot"), 2).cast(DoubleType).as("hour_total"),
        round(sum(col("tot")).over(w), 2).cast(DoubleType).as("moving3"))
      .orderBy(col("event_type"), col("hourn"))
  }

  /** q215 — ACTIVITY STREAKS (the gaps-and-islands pattern): each
    * user's maximal runs of CONSECUTIVE active days, reported as
    * longest streak / streak count / active-day total — the engagement
    * metric retention teams live on, and the canonical SQL idiom for
    * segmenting an ordered set at its gaps: within a user, day − rank
    * is CONSTANT exactly along a gap-free run, so one subtraction turns
    * islands into group keys (no iterative pass, no self-join).
    *
    * Scale shape: one distinct to (user, day) grain, one per-user
    * window whose partition is bounded by the CALENDAR (≤ days rows per
    * user regardless of event volume), then two partial-aggregable
    * groupBys. All integer arithmetic. */
  def q215(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.streaming.EventStreams.epochMicros
    val days = t(spark, dir, "events")
      .select(col("user_id"), epochMicros(col("ts")).as("us"))
      .select(col("user_id"), expr("us DIV 86400000000").as("dayn"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("dayn"))
    val streaks = days
      .withColumn("grp", col("dayn") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
    streaks.groupBy(col("user_id"))
      .agg(
        max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("active_days"))
      .orderBy(col("user_id"))
  }

  /** q216 — ASSOCIATION RULES over per-user behavior (support /
    * confidence / lift for ordered event-type pairs): "users who did X
    * also did Y" — the market-basket staple, here with users as baskets
    * and event types as items. Lift > 1 flags behaviors that co-occur
    * beyond chance; confidence is the conditional adoption rate a
    * growth team reads directly.
    *
    * Scale shape: baskets collapse to DISTINCT (user, type) first —
    * the pair self-join is then bounded by (types per user)² with a
    * user equi-key, never a cross of the event table; item and pair
    * counts are partial-aggregable; the user total is a 1-row
    * broadcast. Ratios divide exact longs in a pinned order and round
    * to 6 dp (the q210 discipline). */
  def q216(spark: SparkSession, dir: String): DataFrame = {
    val items = t(spark, dir, "events")
      .select(col("user_id"), col("event_type")).distinct()
    val nUsers = items.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val single = items.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = items.as("a")
      .join(items.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") =!= col("b.event_type"))
      .groupBy(col("a.event_type").as("x"), col("b.event_type").as("y"))
      .agg(count(lit(1)).as("n_xy"))
    pairs
      .join(single.select(col("event_type").as("x"), col("n").as("n_x")),
        Seq("x"))
      .join(single.select(col("event_type").as("y"), col("n").as("n_y")),
        Seq("y"))
      .crossJoin(broadcast(nUsers))
      .select(col("x"), col("y"), col("n_xy"),
        round(col("n_xy").cast(DoubleType) / col("n_users"), 6)
          .as("support"),
        round(col("n_xy").cast(DoubleType) / col("n_x"), 6)
          .as("confidence"),
        round((col("n_xy").cast(DoubleType) * col("n_users").cast(DoubleType))
          / (col("n_x").cast(DoubleType) * col("n_y").cast(DoubleType)), 6)
          .as("lift"))
      .orderBy(col("x"), col("y"))
  }

  /** q217 — GROWTH ACCOUNTING: the daily new / returning / cumulative
    * user curve (every growth dashboard's first chart). "New" is a
    * user's first-ever active day; the cumulative line is a running sum
    * of daily news — which equals distinct-users-to-date WITHOUT a
    * running-distinct aggregate, the identity that makes the metric
    * cheap at scale (a naive cumulative COUNT(DISTINCT) re-scans
    * history per day).
    *
    * Scale shape: one distinct to (user, day), one per-user min (both
    * partial-aggregable, user-keyed), a day-keyed count join, and a
    * running sum over ≤ calendar-days rows — bounded window, exact
    * integers throughout. */
  def q217(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.streaming.EventStreams.epochMicros
    val days = t(spark, dir, "events")
      .select(col("user_id"), epochMicros(col("ts")).as("us"))
      .select(col("user_id"), expr("us DIV 86400000000").as("dayn"))
      .distinct()
    val active = days.groupBy(col("dayn")).agg(count(lit(1)).as("n_active"))
    val fresh = days.groupBy(col("user_id")).agg(min(col("dayn")).as("dayn"))
      .groupBy(col("dayn")).agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy(col("dayn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    active.join(fresh, Seq("dayn"), "left_outer")
      .select(col("dayn"), col("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
      .withColumn("cum_users", sum(col("n_new")).over(w))
      .orderBy(col("dayn"))
  }
}
