package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Text-analysis operators for training-data curation: language ID, quality
  * scoring, token counting. All exact-arithmetic (integer counts, single
  * final division) so results are deterministic and oracle-checkable; all
  * per-row expression graphs (embarrassingly parallel, no shuffle except
  * final aggregates).
  */
object TextAnalysis {
  import Tables.{apply => t}

  /** Lowercased letter-run tokens of a text column as an array. */
  def toks(c: Column): Column =
    filter(split(lower(c), "[^a-z]+"), w => w =!= "")

  def stopHits(tokens: Column, stops: Seq[String]): Column =
    size(filter(tokens, w => stops.map(s => w === s).reduce(_ || _))).cast(IntegerType)

  val EnStops = Seq("the", "and", "of", "to", "in", "is", "a")
  val DeStops = Seq("der", "die", "das", "und", "ein", "nicht")
  val FrStops = Seq("le", "la", "les", "et", "des", "un")
  val EsStops = Seq("el", "los", "las", "y", "una", "que")

  /** Per-language stopword-hit score columns for a text column. */
  def langScores(text: Column): Seq[Column] = Seq(
    stopHits(toks(text), EnStops).as("en_score"),
    stopHits(toks(text), DeStops).as("de_score"),
    stopHits(toks(text), FrStops).as("fr_score"),
    stopHits(toks(text), EsStops).as("es_score"),
    (length(text) - length(regexp_replace(text, "[\\x{4E00}-\\x{9FFF}]", "")))
      .cast(IntegerType).as("zh_score"))

  /** Argmax language with fixed priority order for ties (expects the
    * langScores columns to be in scope). */
  def langPred: Column =
    when(col("zh_score") > col("en_score") + col("de_score") + col("fr_score") + col("es_score"), "zh")
      .when(col("en_score") >= greatest(col("de_score"), col("fr_score"), col("es_score")), "en")
      .when(col("de_score") >= greatest(col("fr_score"), col("es_score")), "de")
      .when(col("fr_score") >= col("es_score"), "fr")
      .otherwise("es")

  /** Language ID by stopword-profile scoring (n-gram-free heuristic):
    * marker-token hit counts per language + CJK character detection, argmax
    * with a fixed priority order for ties. Deterministic; at scale this is
    * a pure map stage. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    d.select(Seq(col("doc_id"), col("lang")) ++ langScores(col("text")): _*)
      .withColumn("pred", langPred)
      .orderBy(col("doc_id"))
  }

  /** Per-document quality metrics: token/type counts, alphabetic ratio,
    * mean token length, stopword ratio. Integer counts with one final
    * double division each (ROUND(..,4) guard). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val tk = toks(col("text"))
    d.select(
      col("doc_id"),
      size(tk).cast(IntegerType).as("n_tokens"),
      size(array_distinct(tk)).cast(IntegerType).as("n_types"),
      length(regexp_replace(lower(col("text")), "[^a-z]", "")).cast(IntegerType).as("alpha_chars"),
      length(col("text")).cast(IntegerType).as("len"),
      stopHits(tk, EnStops).as("stop_hits"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_types"),
        round(col("alpha_chars").cast(DoubleType) / col("len"), 4).as("alpha_ratio"),
        round(col("alpha_chars").cast(DoubleType) / col("n_tokens"), 4).as("avg_token_len"),
        round(col("stop_hits").cast(DoubleType) / col("n_tokens"), 4).as("stop_ratio"))
      .orderBy(col("doc_id"))
  }

  /** q77 — compression-ratio quality signal per source: deflate each
    * document once and account `compressed/raw` byte ratios. Low ratio =
    * repetitive/templated text, ratio near 1 = high-entropy noise — both
    * ends are the stuff a pretraining filter drops, and neither is
    * visible to token statistics. The Deflater is per-PARTITION state
    * (native zlib allocation amortized over the partition, exactly the
    * mapPartitions shape multimodal decode uses), freed when the
    * partition iterator drains. Ratios are rounded then summed as
    * DECIMAL so per-source means are order-independent. Deflate output
    * length is deterministic for fixed input/level/strategy, but only
    * within a zlib build → rows-only driver check + invariant specs, no
    * cross-engine oracle. */
  def compressionStats(spark: SparkSession, dir: String,
                       level: Int = 6): DataFrame = {
    import spark.implicits._
    val rows = t(spark, dir, "documents")
      .select(col("source"), col("text"))
      .where(length(col("text")) > 0)
      .as[(String, String)]
      .mapPartitions { it =>
        new Iterator[(String, Int, Int)] {
          private val d = new java.util.zip.Deflater(level, true)
          private val buf = new Array[Byte](1 << 16)
          // the drain-time d.end() below never fires if a downstream
          // limit/take stops consuming early or the task is killed — the
          // completion listener frees the native zlib state on every exit
          // path (end() is idempotent, so double-free is safe)
          org.apache.spark.TaskContext.get() match {
            case null => () // driver-local evaluation (e.g. df.show on LocalRelation)
            case tc => tc.addTaskCompletionListener[Unit](_ => d.end())
          }
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) d.end() // idempotent; frees native zlib state
            h
          }
          override def next(): (String, Int, Int) = {
            val (src, text) = it.next()
            val in = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            d.reset(); d.setInput(in); d.finish()
            var out = 0
            while (!d.finished()) out += d.deflate(buf)
            (src, in.length, out)
          }
        }
      }
      .toDF("source", "raw_len", "def_len")
    rows
      .select(col("source"), col("raw_len"), col("def_len"),
        round(col("def_len").cast(DoubleType) / col("raw_len"), 6)
          .cast(DecimalType(16, 6)).as("ratio"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("raw_len")).cast(LongType).as("raw_bytes"),
        sum(col("def_len")).cast(LongType).as("def_bytes"),
        round((sum(col("ratio")) / count(lit(1))).cast(DoubleType), 4)
          .as("avg_ratio"),
        round(min(col("ratio")).cast(DoubleType), 4).as("min_ratio"),
        round(max(col("ratio")).cast(DoubleType), 4).as("max_ratio"))
      .orderBy(col("source"))
  }

  /** q78 — Unicode NFC cleanup accounting per source (native
    * graft.functions.NfcNormalizeExpr; DuckDB `nfc_normalize` is the
    * oracle — both implement UAX #15 canonical composition). Counts
    * documents changed by normalization and the size delta; a map-only
    * pass plus one small aggregate, the shape of every
    * normalize-then-rewrite step at corpus scale. */
  def nfcStats(spark: SparkSession, dir: String): DataFrame = {
    val norm = graft.functions.NfcNormalizeExpr.nfcNormalize(col("text"))
    t(spark, dir, "documents")
      .select(col("source"), col("text"), norm.as("nfc"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("nfc") =!= col("text"), 1L).otherwise(0L))
          .cast(LongType).as("n_changed"),
        sum(length(col("text"))).cast(LongType).as("chars_raw"),
        sum(length(col("nfc"))).cast(LongType).as("chars_nfc"))
      .orderBy(col("source"))
  }

  /** q89 — Gopher-style repetition filter: per-document duplicate-bigram
    * statistics. Repetitive text (templated boilerplate, scraper loops,
    * keyword stuffing) shows up as a high fraction of DUPLICATE adjacent
    * token pairs and a dominant single bigram — neither visible to the
    * type/token ratio in q25. Everything is computed IN-ROW from the
    * token array (bigram build = the q75 pattern; the dominant-bigram
    * count = one linear scan over the SORTED bigram list with a
    * (prev, run, best) accumulator, not the quadratic count-each-gram
    * fold): a pure map stage with zero shuffles before the presentation
    * sort, bounded by document length at any corpus size. The repetitive
    * flag is decided in integer arithmetic (`dup·5 ≥ total` ⇔ frac ≥ 0.2)
    * so threshold ties cannot split on float rounding between engines. */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    d.select(col("doc_id"), toks(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), expr(
        """array_sort(transform(sequence(1, size(tk) - 1),
          |  i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1))))"""
          .stripMargin).as("gs"))
      .select(
        col("doc_id"),
        size(col("gs")).cast(LongType).as("n_bigrams"),
        size(array_distinct(col("gs"))).cast(LongType).as("n_distinct"),
        // longest run in the sorted list = max occurrence count of any
        // bigram; native kernel (MaxRunLenExpr) — the HOF aggregate fold
        // it replaces is CodegenFallback and was >half of q89's runtime,
        // and remains the spec's reference implementation
        graft.functions.MaxRunLenExpr.maxRunLen(col("gs")).as("top_count"))
      .select(
        col("doc_id"), col("n_bigrams"), col("n_distinct"), col("top_count"),
        round((col("n_bigrams") - col("n_distinct")).cast(DoubleType) /
          col("n_bigrams"), 4).as("dup_frac"),
        round(col("top_count").cast(DoubleType) / col("n_bigrams"), 4)
          .as("top_share"),
        ((col("n_bigrams") - col("n_distinct")) * 5L >= col("n_bigrams"))
          .as("repetitive"))
      .orderBy(col("doc_id"))
  }

  /** q93 — source-distribution divergence: KL(source ‖ corpus) over
    * unigram token distributions, the drift/contrast signal that tells a
    * data pipeline which sources are tonally far from the corpus mix
    * (and feeds reweighting decisions like q88's). One (source, word)
    * aggregate feeds everything — per-source totals, the global word
    * distribution (a re-aggregate of the same counts, never a second
    * scan), and the per-term KL contributions; each contribution
    * `p_sw · ln(p_sw/p_w)` is rounded to 8 decimals and summed as DECIMAL
    * per source, so the divergence is order-independent and cross-engine
    * exact (the q74 BM25 pattern — ln on identical doubles matches
    * DuckDB's, spec'd there). Every aggregate partials map-side; the
    * biggest shuffle key is (source, word) — high-cardinality, even. */
  def sourceDivergence(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE tokenizing aggregate; the marginals are WINDOWS over it (the q73
    // lesson: re-grouping + joining back plans a second tokenize because
    // per-branch column pruning defeats exchange reuse). Partition bounds,
    // honestly: the (w)-window holds one row per (source, w) pair — at
    // most n_sources rows per word, genuinely small; the (source)-window
    // holds one source's whole VOCABULARY slice, which grows with corpus
    // vocabulary (sub-linear in corpus size, and windows have no map-side
    // partials — salt via SkewUtils if a single source's vocabulary
    // outgrows a task).
    val sw = t(spark, dir, "documents")
      .select(col("source"), explode(toks(col("text"))).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("c_sw"))
      .withColumn("c_w", sum(col("c_sw")).over(Window.partitionBy(col("w"))))
      .withColumn("t_s", sum(col("c_sw")).over(Window.partitionBy(col("source"))))
      .withColumn("n_types", count(lit(1)).over(Window.partitionBy(col("source"))))
    // the 1-row grand total re-scans WITHOUT exploding (sum of per-doc
    // token counts — a map + tiny agg, no (source, word) shuffle)
    val tot = t(spark, dir, "documents")
      .select(size(toks(col("text"))).cast(LongType).as("n"))
      .agg(sum(col("n")).as("t"))
    val pSw = col("c_sw").cast(DoubleType) / col("t_s")
    val pW = col("c_w").cast(DoubleType) / col("t")
    sw.crossJoin(broadcast(tot))
      .select(col("source"), col("t_s"), col("n_types"),
        round(pSw * log(pSw / pW), 8).cast(DecimalType(18, 8)).as("term"))
      .groupBy(col("source"), col("t_s"), col("n_types"))
      .agg(round(sum(col("term")).cast(DoubleType), 6).as("kl"))
      .select(col("source"), col("t_s").cast(LongType).as("n_tokens"),
        col("n_types"), col("kl"))
      .orderBy(col("source"))
  }

  /** q114 — PII redaction: the scrub stage (emails, phone numbers)
    * every public-web training corpus runs before anything else sees the
    * text. Pure map-only expression graph — codegen'd `regexp_extract_all`
    * for counting and chained `regexp_replace` for redaction, no UDF, no
    * shuffle except the presentation sort — so it runs at scan speed and
    * composes in front of any other tier. The pattern set is a plugged
    * constant here; production swaps in its own list (the shape —
    * count-then-replace per class, digest of the redacted text — is the
    * operator).
    *
    * The fixture has no PII, so it is PLANTED deterministically (the
    * q112/q113 pattern, identical in both engines): docs ≡ 0 (mod 3)
    * gain one email, docs ≡ 0 (mod 9) a second, docs ≡ 0 (mod 5) a
    * phone number — overlapping residue classes so counts vary 0–2 and
    * redaction order matters on docs hit by both. Patterns stay in the
    * RE2 ∩ java.util.regex common dialect (character classes and `+`
    * only), so Spark and DuckDB compile them identically; the redacted
    * text is verified end-to-end by md5 digest. */
  def q114(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
    val phoneRe = "555-[0-9]+"
    val planted = concat(
      col("text"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(9)) === 0,
        concat(lit(" or user"), col("doc_id"), lit("b@example.org later")))
        .otherwise(lit("")),
      when(pmod(col("doc_id"), lit(5)) === 0,
        concat(lit(" call 555-"), pmod(col("doc_id"), lit(10000)), lit(" today")))
        .otherwise(lit("")))
    t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), planted.as("text"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
          .cast(IntegerType).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(phoneRe), lit(0)))
          .cast(IntegerType).as("n_phones"),
        md5(regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>")).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  /** q117 — OVERLAPPING TOKEN-WINDOW CHUNKING: split every document
    * into fixed-size token windows with a stride (window 32, stride 24
    * → 8-token overlap), the passage-extraction stage ahead of
    * embedding/RAG indexing and context-window-bounded scoring. Chunk i
    * covers tokens [i·stride, i·stride + window); the last window is
    * short rather than padded; a doc shorter than one window yields
    * exactly one chunk. Chunks are presented as md5 digests of the
    * space-joined window (the downstream join key), not the text itself
    * — the token payload never rides past the map stage.
    *
    * Scale shape: map-only — tokenize once, explode a per-doc
    * `sequence(0, n_chunks-1)`, slice the pinned token array per chunk.
    * No shuffle anywhere (the final presentation sort is the only
    * exchange); output rows ≈ total_tokens/stride. */
  def q117(spark: SparkSession, dir: String,
           window: Int = 32, stride: Int = 24): DataFrame = {
    val W = lit(window.toLong); val S = lit(stride.toLong)
    t(spark, dir, "documents")
      .select(col("doc_id").cast(LongType), toks(col("text")).as("toks"))
      .withColumn("n_tok", size(col("toks")).cast(LongType))
      .where(col("n_tok") > 0)
      // n_chunks = 1 + ceil(max(n_tok - W, 0) / S), integral arithmetic:
      // ceil(a/b) = (a + b - 1) div b for a >= 0
      .withColumn("n_chunks",
        expr(s"1L + (greatest(n_tok - ${window}L, 0L) + ${stride - 1}L) div ${stride}L"))
      .select(col("doc_id"), col("toks"), col("n_tok"),
        explode(sequence(lit(0L), col("n_chunks") - 1L)).as("chunk_id"))
      .select(
        col("doc_id"), col("chunk_id"),
        (col("chunk_id") * S).as("start_tok"),
        least(W, col("n_tok") - col("chunk_id") * S).as("n_tok_chunk"),
        md5(concat_ws(" ",
          slice(col("toks"), (col("chunk_id") * S + 1L).cast(IntegerType),
            lit(window)))).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Token accounting per source: whitespace tokens and BPE-ish regex
    * tokens (letter runs | digit runs | single other non-space), the basis
    * of token-budget bookkeeping in a data pipeline. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    d.select(
        col("source"),
        size(filter(split(col("text"), " "), x => x =!= "")).cast(LongType).as("ws"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .cast(LongType).as("re"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws")).cast(LongType).as("ws_tokens"),
        sum(col("re")).cast(LongType).as("re_tokens"),
        round(sum(col("ws")).cast(DoubleType) / count(lit(1)), 4).as("avg_ws_tokens"))
      .orderBy(col("source"))
  }

  /** q120 — vocabulary coverage / OOV accounting: build the top-V
    * vocabulary by corpus token frequency (ties broken on the token — a
    * TOTAL deterministic order, never raw count order alone) and report
    * each source's out-of-vocabulary token rate — the tokenizer-fit
    * metric a pipeline checks before committing a tokenizer to a corpus
    * mix.
    *
    * Scale shape: token counts partial-agg map-side into a vocabulary-
    * sized table (tiny next to the corpus — Heaps' law), the top-V cut is
    * a bounded sort-limit on THAT table (never on corpus rows), and the
    * vocabulary rides back over the token stream as a BROADCAST semi
    * probe — the stream stays partitioned as scanned, no shuffle joins a
    * corpus-scale side. Counts are exact integers; the one division is
    * final, rounded to 6. */
  def q120(spark: SparkSession, dir: String, topV: Int = 20): DataFrame = {
    val tokens = t(spark, dir, "documents")
      .select(col("source"), explode(toks(col("text"))).as("word"))
    val vocab = tokens.groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(topV)
      .select(col("word"), lit(1).as("in_vocab"))
    tokens.join(broadcast(vocab), Seq("word"), "left_outer")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"),
        round(sum(when(col("in_vocab").isNull, 1.0d).otherwise(0.0d)) /
          count(lit(1)), 6).as("oov_rate"))
      .orderBy(col("source"))
  }

  /** q121 — pairwise source-similarity matrix: trigram-set Jaccard
    * between every pair of sources — the mixture diagnostic q93's
    * source-vs-corpus divergence cannot give (two sources can both sit
    * near the corpus mix yet be near-clones of each other, exactly what
    * a mixture weighter must not double-count).
    *
    * Shape (the q119 single-subtree discipline): ONE tokenizing distinct
    * (source, gram) table with the per-source set size as a WINDOW over
    * the source partition; the pair counts come from a gram-keyed
    * self-join of that one subtree (canonically identical sides →
    * ReusedExchange). Per-gram join fan-out is bounded by S² for S
    * sources — S is structurally small (a catalog, not a corpus), and
    * the distinct-first aggregation means corpus volume only enters
    * through the (source, gram) distinct, keyed by the PAIR. Integer
    * arithmetic until the one final division, rounded to 6. Zero-overlap
    * pairs are absent by construction (inner bucket join — a dense S²
    * matrix would have to be manufactured, not discovered). */
  def q121(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sg = t(spark, dir, "documents")
      .select(col("source"),
        filter(split(lower(col("text")), "[^a-z]+"), w => w =!= "").as("tk"))
      .where(size(col("tk")) >= 3)
      .select(col("source"),
        explode(transform(sequence(lit(1), size(col("tk")) - 2),
          i => concat_ws(" ", slice(col("tk"), i, lit(3))))).as("gram"))
      .distinct()
      .withColumn("sz", count(lit(1)).over(Window.partitionBy(col("source"))))
    sg.as("a").join(sg.as("b"),
        col("a.gram") === col("b.gram") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"),
        col("a.sz").as("na"), col("b.sz").as("nb"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col("s1"), col("s2"), col("n_shared"),
        round(col("n_shared").cast(DoubleType) /
          (col("na") + col("nb") - col("n_shared")), 6).as("jaccard"))
      .orderBy(col("s1"), col("s2"))
  }

  /** q130 — ADAPTIVE length filter: drop each source's length-outlier
    * documents using that SOURCE's own token-length distribution (a
    * fixed global cut is wrong when a code source's median is 10× a
    * chat source's — the standard per-source P5/P95 trim).
    *
    * Exact and scale-safe without any per-source sort: token lengths
    * histogram into fixed-width integer buckets (width 16); the running
    * bucket count is a window partitioned by SOURCE over the BUCKETS —
    * bounded rows per source regardless of corpus size (the doc-level
    * work is one groupBy(source, bucket) with map-side partials). The
    * P5/P95 cut-points are the first buckets whose cumulative count
    * reaches ceil(5%·n) / ceil(95%·n), computed in pure integer
    * arithmetic (`(n·p + 99) DIV 100`), so the thresholds are exact and
    * engine-portable — then one broadcast join back tags every document.
    * Bucket-resolution trimming (the cut lands on a bucket boundary) is
    * the documented semantics: deterministic, and at width 16 well
    * inside the tolerance any length-trim rule has. */
  def q130(spark: SparkSession, dir: String, width: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(toks(col("text"))).cast(LongType).as("n_tok"))
    val hist = docs
      .groupBy(col("source"), expr(s"n_tok DIV $width").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("source")).orderBy(col("bucket"))
    val cuts = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total",
        sum(col("cnt")).over(Window.partitionBy(col("source"))))
      .groupBy(col("source"))
      .agg(
        min(when(col("cum") * 100 >= col("total") * 5, col("bucket")))
          .as("b05"),
        min(when(col("cum") * 100 >= col("total") * 95, col("bucket")))
          .as("b95"))
    docs.join(broadcast(cuts), Seq("source"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        (col("b05") * width).as("lo_tok"),
        ((col("b95") + 1) * width - 1).as("hi_tok"),
        when(expr(s"n_tok DIV $width").between(col("b05"), col("b95")), 1)
          .otherwise(0).cast(IntegerType).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** q132 — cumulative NOVELTY score: how much genuinely new content
    * each document adds in corpus (doc_id) order — the fraction of its
    * distinct trigrams whose FIRST corpus occurrence is this document.
    * The marginal-contribution signal a curriculum/ordering pass or an
    * incremental-crawl triage wants (a doc can be no near-duplicate of
    * any single other doc yet still be 0% novel against the corpus as a
    * whole — pairwise dedup cannot see that).
    *
    * Shape: ONE distinct (doc, gram) table; the first-occurrence id is
    * a min window over the GRAM partition (gram-keyed shuffle, the
    * inverted-index family), then a doc-keyed count-if. Integer counts,
    * one rounded divide. Zero-gram documents (< 3 tokens) surface with
    * n_grams = 0 and NULL novelty via the left join from documents. */
  def q132(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dg = t(spark, dir, "documents")
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z]+"), w => w =!= "").as("tk"))
      .where(size(col("tk")) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("tk")) - 2),
          i => concat_ws(" ", slice(col("tk"), i, lit(3))))).as("gram"))
      .distinct()
      .withColumn("first_id",
        min(col("doc_id")).over(Window.partitionBy(col("gram"))))
    val per = dg.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("first_id") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
    t(spark, dir, "documents").select(col("doc_id"))
      .join(per, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(col("n_grams").isNotNull,
          round(col("n_novel").cast(DoubleType) /
            col("n_grams").cast(DoubleType), 6)).as("novelty"))
      .orderBy(col("doc_id"))
  }

  /** q139 — intra-document repeated-span REMOVAL (the ExactSubstr idea of
    * Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    * Better", applied within documents): every token position covered by
    * a NON-FIRST occurrence of a repeated n-gram span is dropped and the
    * cleaned text rebuilt. n = 3 here so the synthetic corpus exercises
    * the path non-vacuously (27/500 docs at sf0.01 carry a repeat);
    * production runs the same graph with n ≈ 50.
    *
    * Scale shape: gram generation is a per-row array transform (map
    * only); first-occurrence detection is one aggregate on
    * (doc_id, gram) — never corpus-global, keys don't cross documents;
    * coverage expansion is a bounded explode (n rows per repeated span)
    * folded straight into a per-doc covered-position SET (collect_set
    * dedups map-side — the r13 rebuild, shared with q142: the corpus
    * token stream never shuffles; each doc's cleaned text is an in-row
    * array filter against its covered set, bounded by document length
    * like every per-doc op here). No windows, no cartesian anything. */
  def q139(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), toks(col("text")).as("tk"))
    val grams = docs.where(size(col("tk")) >= n)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(tk) - ${n - 1}),
           |  i -> struct(i as p, concat_ws(' ', slice(tk, i, $n)) as g))"""
          .stripMargin)).as("s"))
      .select(col("doc_id"), col("s.p").as("p"), col("s.g").as("g"))
    val firstOcc = grams.groupBy(col("doc_id"), col("g"))
      .agg(min(col("p")).as("minp"))
    val covered = grams.join(firstOcc, Seq("doc_id", "g"))
      .where(col("p") > col("minp"))
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (n - 1))).as("pos"))
    val covSets = covered.groupBy(col("doc_id"))
      .agg(collect_set(col("pos")).as("cov"))
    docs.join(covSets, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), size(col("tk")).cast(LongType).as("n_tok"),
        filter(col("tk"), (_, i) =>
          !array_contains(coalesce(col("cov"),
            array().cast(ArrayType(IntegerType))), i + 1))
          .as("kept"))
      .select(col("doc_id"), col("n_tok"),
        size(col("kept")).cast(LongType).as("n_kept"),
        when(size(col("kept")) > 0, array_join(col("kept"), " "))
          .as("cleaned"))
      .select(col("doc_id"), col("n_tok"),
        (col("n_tok") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        round((col("n_tok") - coalesce(col("n_kept"), lit(0L)))
          .cast(DoubleType) / col("n_tok").cast(DoubleType), 6)
          .as("drop_ratio"),
        substring(coalesce(col("cleaned"), lit("")), 1, 80)
          .as("cleaned_prefix"))
      .orderBy(col("doc_id"))
  }

  /** q147 — Gopher-style document-quality RULE AUDIT (Rae et al. 2021,
    * Appendix A): the five structural filter rules a pretraining
    * curation pass applies before any model-based scoring, evaluated
    * per document and accounted per source — word count in [20, 80],
    * mean word length in [4, 10], ≥ 2 distinct stop words, type/token
    * ratio ≥ 0.3, and no single word above 20% of tokens. (Thresholds
    * parameterize the same rules Gopher runs at web scale; the line-level
    * rules are omitted because the fixture corpus is single-line.)
    *
    * Every rule is INTEGER arithmetic (cross-multiplied ratios: mean ≥ 4
    * ⟺ chars ≥ 4·n), so the audit is exact, order-independent, and
    * oracle-checkable with no float comparisons anywhere.
    *
    * Scale shape: per-doc stats are one map-side projection of
    * higher-order array expressions (no explode — the token array never
    * leaves its row); the only shuffle is the per-source count
    * aggregate. The per-doc maxf term is O(n·distinct) in the row, the
    * corpus cost O(corpus) — a 100 TB audit is one pass. */
  /** The q147 per-document rule features (doc_id carried so evaluation
    * queries — classifier AUC/reliability q239/q240 — can use the rule
    * gate as a per-doc label), and the pass conjunction over them. */
  private[graft] def gopherDoc(spark: SparkSession, dir: String)
      : DataFrame = {
    val stopsIn = EnStops.map(s => s"'$s'").mkString(", ")
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("source"),
        size(col("ws")).as("n"),
        size(array_distinct(col("ws"))).as("nd"),
        expr("aggregate(ws, 0, (a, x) -> a + length(x))").as("chars"),
        expr(s"size(filter(array_distinct(ws), u -> u IN ($stopsIn)))")
          .as("stops"),
        expr("array_max(transform(array_distinct(ws), u -> size(filter(ws, x -> x = u))))")
          .as("maxf"))
  }

  /** The q147 pass conjunction over [[gopherDoc]]'s columns. */
  private[graft] def gopherPass: Column =
    col("n") >= 20 && col("n") <= 80 &&
      col("chars") >= col("n") * 4 && col("chars") <= col("n") * 10 &&
      col("stops") >= 2 && col("nd") * 10 >= col("n") * 3 &&
      col("maxf") * 5 <= col("n")

  def q147(spark: SparkSession, dir: String): DataFrame = {
    val d = gopherDoc(spark, dir)
    d.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n") < 20 || col("n") > 80, 1L).otherwise(0L))
          .as("f_len"),
        sum(when(col("chars") < col("n") * 4 || col("chars") > col("n") * 10,
          1L).otherwise(0L)).as("f_meanlen"),
        sum(when(col("stops") < 2, 1L).otherwise(0L)).as("f_stop"),
        sum(when(col("nd") * 10 < col("n") * 3, 1L).otherwise(0L))
          .as("f_ttr"),
        sum(when(col("maxf") * 5 > col("n"), 1L).otherwise(0L)).as("f_rep"),
        sum(when(gopherPass, 1L).otherwise(0L)).as("n_pass"))
      .orderBy(col("source"))
  }

  /** q155 — document-LENGTH distribution per source, in power-of-two
    * buckets: the corpus-card histogram every dataset release publishes
    * (length distributions shift when a scraper, extractor, or filter
    * changes — a scalar mean hides bimodality). Bucket = ⌊log₂ n_tok⌋,
    * computed as `length(bin(n)) − 1` — pure INTEGER arithmetic, because
    * the float log2 route rounds 2^k to k−ε on some libms and misbuckets
    * exact powers of two (and engines disagree on which way). Histogram
    * rows are mergeable counts (map-side partials; slices/streams sum
    * cell-wise — the q143 sketch-grid property, for free).
    *
    * Scale shape: one tokenize → one (source, bucket) aggregate; the
    * per-source share join is against the bounded per-source totals. */
  def q155(spark: SparkSession, dir: String): DataFrame = {
    val h = t(spark, dir, "documents")
      .select(col("source"), size(toks(col("text"))).as("n_tok"))
      .where(col("n_tok") >= 1)
      .select(col("source"),
        (length(bin(col("n_tok"))) - 1).cast(IntegerType).as("bucket"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = h.groupBy(col("source")).agg(sum(col("n_docs")).as("n_total"))
    h.join(tot, Seq("source"))
      .select(col("source"), col("bucket"),
        expr("shiftleft(CAST(1 AS BIGINT), bucket)").as("lo"),
        expr("shiftleft(CAST(1 AS BIGINT), bucket + 1) - 1").as("hi"),
        col("n_docs"),
        round(col("n_docs").cast(DoubleType) /
          col("n_total").cast(DoubleType), 4).as("share"))
      .orderBy(col("source"), col("bucket"))
  }

  /** The AUGMENTED deterministic corpus for the statistical-law queries
    * (VERDICT r10 #7): the fixture's `documents.text` has only 31
    * distinct words (FIXTURES.md), so vocabulary-scaling laws fit
    * near-degenerate curves over it. This derives a vocabulary-rich
    * token stream IN-QUERY, bit-for-bit identically in both engines
    * (the q111 planted-twin discipline) — `tokensPerDoc` tokens per
    * document from a three-step Lehmer/Park–Miller chain
    * (the q45 `bucket100` generator, seed `doc_id·409 + i`):
    *
    *  - 70% HEAD draws: rank `100000 DIV (u % 100000 + 1)` — the
    *    integer inverse-power trick, giving a genuine heavy-tailed
    *    rank-frequency curve (density ∝ 1/r², top frequencies measured
    *    6986/2359/1160/… on the fixture);
    *  - 30% TAIL draws: uniform over 8 000 rare ids, disjoint id space —
    *    the open-vocabulary mass that makes Heaps growth non-trivial;
    *  - ids render as 4-letter base-26 words (`chr` arithmetic, same in
    *    both engines), so char-level consumers (BPE) see varied symbol
    *    sequences, not digits.
    *
    * Measured at the default depth: 48 000 tokens, 6 306 distinct words
    * corpus-wide (vs 31), ~790 per source — the ≥1k-vocabulary fixture
    * the law fits need. All integer arithmetic before the final render:
    * partition-order-free and replayed exactly by the DuckDB oracles. */
  def augmentedWords(spark: SparkSession, dir: String,
                     tokensPerDoc: Int = 96): DataFrame = {
    val M = 2147483647L
    t(spark, dir, "documents")
      .select(col("doc_id").cast(LongType).as("doc_id"), col("source"),
        explode(sequence(lit(1), lit(tokensPerDoc))).as("i"))
      .select(col("doc_id"), col("source"),
        ((col("doc_id") * 409L + col("i")) * 48271L % M).as("u1"))
      .select(col("doc_id"), col("source"),
        (col("u1") * 48271L % M).as("u2"))
      .select(col("doc_id"), col("source"), col("u2"),
        (col("u2") * 48271L % M).as("u3"))
      .select(col("doc_id"), col("source"),
        when(col("u2") % 10L < 7L, expr("100000 DIV (u3 % 100000 + 1)"))
          .otherwise(lit(200000L) + col("u3") % 8000L).as("r"))
      .select(col("doc_id"), col("source"),
        expr("concat(char(CAST(97 + (r DIV 17576) % 26 AS INT)), " +
          "char(CAST(97 + (r DIV 676) % 26 AS INT)), " +
          "char(CAST(97 + (r DIV 26) % 26 AS INT)), " +
          "char(CAST(97 + r % 26 AS INT)))").as("word"))
  }

  /** q157 — per-source ZIPF SLOPE: least-squares fit of log frequency
    * against log rank over each source's term distribution — the
    * corpus-card scalar that flags template/boilerplate sources (slope
    * far below −1: a few phrases dominate) and synthetic/noise sources
    * (slope near 0: flat distribution). Natural text sits near −1
    * (Zipf's law).
    *
    * RE-POINTED at [[augmentedWords]] (round 11): the raw fixture's
    * 31-word vocabulary fit a degenerate curve; the augmented corpus's
    * measured heavy tail makes the slope a real statistic. The operator
    * is unchanged — any (source, word) stream fits.
    *
    * Numeric discipline: each per-term regression contribution (ln rank,
    * ln freq, their product, the square) is rounded to 8 dp and summed
    * as DECIMAL — exact and order-independent under partial aggregation
    * — then the closed-form slope divides two doubles computed in the
    * same operation order in both engines, so the fit is oracle-exact.
    *
    * Scale shape: one map-only token generation → (source, word) counts;
    * the rank window partitions by SOURCE over vocabulary-sized rows
    * (each source's vocab ≪ its token count); the fit is one aggregate
    * over those rows. */
  def q157(spark: SparkSession, dir: String): DataFrame =
    zipfSlopeOf(augmentedWords(spark, dir))

  /** q157's fit machinery over any `(source, word)` stream — split out
    * so the golden-fixture specs can drive it with controlled
    * vocabularies. */
  private[graft] def zipfSlopeOf(words: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = words
      .groupBy(col("source"), col("word")).agg(count(lit(1)).as("n"))
    val ranked = tf.withColumn("rank",
      row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("n").desc, col("word"))))
    def dec8(c: org.apache.spark.sql.Column) =
      round(c, 8).cast(DecimalType(18, 8))
    val lx = log(col("rank").cast(DoubleType))
    val ly = log(col("n").cast(DoubleType))
    val agg = ranked.select(col("source"),
        dec8(lx).as("x"), dec8(ly).as("y"),
        dec8(lx * ly).as("xy"), dec8(lx * lx).as("xx"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("k"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("xy")).as("sxy"), sum(col("xx")).as("sxx"))
    agg.select(col("source"), col("k").as("n_terms"),
        when(
          col("k").cast(DoubleType) * col("sxx").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sx").cast(DoubleType) =!= 0.0d,
          round(
            (col("k").cast(DoubleType) * col("sxy").cast(DoubleType) -
              col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
            (col("k").cast(DoubleType) * col("sxx").cast(DoubleType) -
              col("sx").cast(DoubleType) * col("sx").cast(DoubleType)), 4))
          .as("zipf_slope"))
      .orderBy(col("source"))
  }

  /** q158 — HEAPS' LAW vocabulary-growth fit per source: V(N) ≈ K·N^β,
    * the companion scalar to the Zipf slope (q157) on every corpus
    * card — β near 1 means each document brings fresh vocabulary (open
    * domain, or noise), β near 0 means the source recycles a closed
    * template vocabulary. Growth is measured over ten deterministic
    * corpus prefixes (the q45 Lehmer bucket in deciles — reproducible,
    * retry-stable, engine-portable; a doc-order prefix would not be),
    * each point (ln N, ln V) entering the q157 decimal least-squares
    * fit.
    *
    * Relational shape — NO per-prefix rescan: a word's contribution to
    * every prefix is determined by its FIRST-occurrence decile (one
    * (source, word) min-aggregate), so V(f) is a cumulative sum over a
    * 10-row-per-source histogram; N(f) likewise from the per-decile
    * token counts. The cumulative windows run over ≤ 10 rows per
    * source — bounded by construction. */
  def q158(spark: SparkSession, dir: String): DataFrame = {
    // q45's Lehmer bucket (Curation.bucket100), decile-folded.
    // RE-POINTED at augmentedWords (round 11, the q157 note): Heaps
    // growth over a 31-word vocabulary saturated in the first decile.
    def decile(id: org.apache.spark.sql.Column) =
      (id * 48271L) % 2147483647L % 100 / 10
    heapsOf(augmentedWords(spark, dir)
      .select(col("source"), decile(col("doc_id")).cast(IntegerType).as("dc"),
        col("word")))
  }

  /** q158's fit machinery over any `(source, dc, word)` stream (dc =
    * the prefix decile) — split out for the golden-fixture specs. */
  private[graft] def heapsOf(aw: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vHist = aw
      .groupBy(col("source"), col("word"))
      .agg(min(col("dc")).as("mb"))
      .groupBy(col("source"), col("mb").as("dc"))
      .agg(count(lit(1)).as("v_new"))
    val nHist = aw
      .groupBy(col("source"), col("dc"))
      .agg(count(lit(1)).as("n_tok"))
    val bySrc = Window.partitionBy(col("source")).orderBy(col("dc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val points = nHist
      .join(vHist, Seq("source", "dc"), "left_outer")
      .withColumn("v", sum(coalesce(col("v_new"), lit(0L))).over(bySrc))
      .withColumn("n", sum(col("n_tok")).over(bySrc))
      .where(col("v") > 0 && col("n") > 0)
    def dec8(c: org.apache.spark.sql.Column) =
      round(c, 8).cast(DecimalType(18, 8))
    val lx = log(col("n").cast(DoubleType))
    val ly = log(col("v").cast(DoubleType))
    val agg = points.select(col("source"),
        dec8(lx).as("x"), dec8(ly).as("y"),
        dec8(lx * ly).as("xy"), dec8(lx * lx).as("xx"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("k"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("xy")).as("sxy"), sum(col("xx")).as("sxx"))
    val denom = col("k").cast(DoubleType) * col("sxx").cast(DoubleType) -
      col("sx").cast(DoubleType) * col("sx").cast(DoubleType)
    val beta = (col("k").cast(DoubleType) * col("sxy").cast(DoubleType) -
      col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) / denom
    agg.select(col("source"), col("k").as("n_points"),
        when(denom =!= 0.0d, round(beta, 4)).as("beta"),
        when(denom =!= 0.0d, round(
          exp((col("sy").cast(DoubleType) - beta *
            col("sx").cast(DoubleType)) / col("k").cast(DoubleType)), 4))
          .as("k_coeff"))
      .orderBy(col("source"))
  }

  /** q142 — CROSS-document exact-substring span removal (the full
    * ExactSubstr of Lee et al. 2022, where q139 is its intra-document
    * restriction): an n-gram span is kept only at its globally FIRST
    * occurrence — minimal (doc_id, pos) lexicographically — and every
    * token position covered by any other occurrence, in any document,
    * is dropped. The canonical cross-corpus near-verbatim-boilerplate
    * cleaner (license headers, templated navigation, syndicated wire
    * text). n = 3 keeps the synthetic corpus non-vacuous; production
    * runs n ≈ 50, where repeated spans are true verbatim duplication
    * and gram document-frequency collapses to ~1.
    *
    * Scale shape: the only corpus-wide keys are GRAMS (inverted-index
    * family). First-occurrence is ONE algebraic min-aggregate on the
    * gram key (map-side partials; no window): the lexicographic
    * min(struct(doc_id, p)) IS "earliest doc, then earliest position
    * within it" (the oracle spells it as two min-aggregates — same
    * relation; r13 fused the Spark side so the gram stream is read once
    * by the aggregate instead of twice). The join back to occurrences
    * is gram-keyed; at production n the per-gram fan-in is ~duplication
    * depth. Coverage expansion is a bounded explode (n rows per
    * non-first occurrence) folded straight into a per-doc covered-
    * position SET (collect_set dedups map-side — the r13 rebuild: the
    * corpus token stream never shuffles; each doc's cleaned text is an
    * in-row array filter against its covered set, so the only
    * token-scale work is the one gram generation pass). */
  def q142(spark: SparkSession, dir: String, n: Int = 3): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), toks(col("text")).as("tk"))
    val grams = docs.where(size(col("tk")) >= n)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(tk) - ${n - 1}),
           |  i -> struct(i as p, concat_ws(' ', slice(tk, i, $n)) as g))"""
          .stripMargin)).as("s"))
      .select(col("doc_id"), col("s.p").as("p"), col("s.g").as("g"))
    // global first occurrence of each gram: lexicographic min over
    // (doc_id, p) — one gram-keyed algebraic aggregate
    val firstOcc = grams.groupBy(col("g"))
      .agg(min(struct(col("doc_id"), col("p"))).as("m"))
      .select(col("g"), col("m.doc_id").as("fd"), col("m.p").as("minp"))
    val covered = grams.join(firstOcc, Seq("g"))
      .where(col("doc_id") =!= col("fd") ||
        (col("doc_id") === col("fd") && col("p") > col("minp")))
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (n - 1))).as("pos"))
    val covSets = covered.groupBy(col("doc_id"))
      .agg(collect_set(col("pos")).as("cov"))
    docs.join(covSets, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), size(col("tk")).cast(LongType).as("n_tok"),
        filter(col("tk"), (_, i) =>
          !array_contains(coalesce(col("cov"),
            array().cast(ArrayType(IntegerType))), i + 1))
          .as("kept"))
      .select(col("doc_id"), col("n_tok"),
        size(col("kept")).cast(LongType).as("n_kept"),
        when(size(col("kept")) > 0, array_join(col("kept"), " "))
          .as("cleaned"))
      .select(col("doc_id"), col("n_tok"),
        (col("n_tok") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        when(col("n_tok") > 0,
          round((col("n_tok") - coalesce(col("n_kept"), lit(0L)))
            .cast(DoubleType) / col("n_tok").cast(DoubleType), 6))
          .as("drop_ratio"),
        substring(coalesce(col("cleaned"), lit("")), 1, 80)
          .as("cleaned_prefix"))
      .orderBy(col("doc_id"))
  }

  /** q174 — PII INGEST GATE: detect and redact email addresses and
    * US-style phone numbers at the compliance boundary. Three PII
    * operators split the space deliberately: [[q114]] is the BATCH
    * corpus scrub (loose patterns, md5-verified redacted text,
    * overlapping residue plants); q174 is the INGEST-GATE form — word-
    * boundary-ANCHORED patterns, a kernel ([[piiScrub]]) that is
    * STATELESS by construction and therefore shared verbatim with the
    * streaming gate (EventStreams.piiGate, drain-equality spec'd), and
    * a COMPLETENESS proof (re-scanning redacted text finds nothing);
    * [[q176]] replaces redaction with linkage-preserving
    * pseudonymization. Because the synthetic fixture
    * carries no organic PII, the query PLANTS it deterministically
    * in-corpus (the q111/q112/q168 planted-twin discipline): every
    * doc_id ≡ 0 (mod 7) gains an email, every doc_id ≡ 0 (mod 11) a
    * formatted phone number, so detection counts and redacted lengths
    * are closed-form checkable and BOTH regex paths are non-vacuously
    * exercised (doc 0, 77, 154… carry both).
    *
    * The patterns stay inside the Java-regex ∩ RE2 common dialect
    * (character classes, bounded repetition, `\b` ASCII word boundary)
    * so the DuckDB oracle applies the IDENTICAL expressions — the scrub
    * is oracle-exact, not spot-checked. Scale shape: map-only (one
    * whole-stage codegen span over the scan; regexes compile once per
    * task), then a pushed filter — no shuffle at all except the final
    * presentation sort. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** The deterministic PII plant for a (doc_id, text) row — see [[q174]]. */
  def piiPlanted: Column = concat(
    col("text"),
    when(col("doc_id") % 7 === 0,
      concat(lit(" contact user"), col("doc_id").cast(StringType),
        lit("@example.com now"))).otherwise(lit("")),
    when(col("doc_id") % 11 === 0,
      concat(lit(" call 555-"),
        format_string("%03d", pmod(col("doc_id"), lit(1000L))),
        lit("-"),
        format_string("%04d", pmod(col("doc_id"), lit(10000L))),
        lit(" ok"))).otherwise(lit("")))

  /** PII detect + redact over any (doc_id, raw) frame — map-only, so
    * the SAME transform serves the batch corpus pass (q174) and the
    * streaming ingest gate (EventStreams.piiGate): on an unbounded
    * stream every expression here is stateless and append-safe. */
  def piiScrub(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast(LongType), col("raw"))
      .select(col("doc_id"),
        regexp_count(col("raw"), lit(EmailRe))
          .cast(IntegerType).as("n_email"),
        regexp_count(col("raw"), lit(PhoneRe))
          .cast(IntegerType).as("n_phone"),
        length(regexp_replace(
            regexp_replace(col("raw"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"))
          .cast(LongType).as("clean_len"),
        length(col("raw")).cast(LongType).as("raw_len"))
      .where(col("n_email") + col("n_phone") > 0)

  def q174(spark: SparkSession, dir: String): DataFrame =
    piiScrub(t(spark, dir, "documents")
      .select(col("doc_id").cast(LongType), piiPlanted.as("raw")))
      .orderBy(col("doc_id"))

  /** The stable token a PII value `m` pseudonymizes to. */
  private def pseudoTok(family: String)(m: Column): Column =
    concat(lit(s"<$family:"), substring(md5(m), 1, 8), lit(">"))

  /** All distinct matches of `re` in `raw`, value-ascending — the
    * display order for the per-document token list. */
  private def piiMatches(raw: Column, re: String): Column =
    array_sort(array_distinct(regexp_extract_all(raw, lit(re), lit(0))))

  /** Replace EVERY occurrence of every distinct match with that MATCH'S
    * own token — a fold of literal `replace` over the distinct match
    * list, longest match first (a shorter value that happens to be a
    * substring of a longer one in the same document must not fire
    * first and corrupt the longer occurrence). One fold per PII
    * family; a token can never re-match either regex (no `@`, no
    * NNN-NNN-NNNN digit shape), so family folds compose freely. */
  private def pseudoScrub(raw: Column, matches: Column,
                          family: String): Column = {
    val lenDesc = array_sort(matches, (l, r) =>
      when(length(l) =!= length(r), length(r) - length(l))
        .otherwise(when(l < r, -1).when(l > r, 1).otherwise(0)))
    aggregate(lenDesc, raw, (acc, m) => replace(acc, m, pseudoTok(family)(m)))
  }

  /** The q176 kernel over a (doc_id, raw) frame — PER-MATCH consistent
    * pseudonymization. Every expression is stateless and map-only, so
    * the identical graph is the streaming ingest gate
    * (EventStreams.pseudoGate): append-safe, batch boundaries invisible
    * (StreamingPiiSpec proves drain-equality). A document with several
    * DISTINCT values of one family gets several distinct tokens — each
    * occurrence rewritten with ITS value's token (the invariant "equal
    * values map to equal tokens everywhere" holds per match, not per
    * document). */
  def piiPseudonymize(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id").cast(LongType), col("raw"))
      .select(col("doc_id"), col("raw"),
        piiMatches(col("raw"), EmailRe).as("em"),
        piiMatches(col("raw"), PhoneRe).as("ph"))
    base.select(col("doc_id"),
        when(size(col("em")) > 0,
          array_join(transform(col("em"), m => pseudoTok("EMAIL")(m)), ","))
          .as("email_pseudo"),
        when(size(col("ph")) > 0,
          array_join(transform(col("ph"), m => pseudoTok("PHONE")(m)), ","))
          .as("phone_pseudo"),
        md5(pseudoScrub(pseudoScrub(col("raw"), col("em"), "EMAIL"),
          col("ph"), "PHONE")).as("pseudo_md5"))
      .where(col("email_pseudo").isNotNull || col("phone_pseudo").isNotNull)
  }

  /** q176 planted corpus: the q174 plant PLUS a second, different-residue
    * value per family on coarser strides (doc_id ≡ 0 mod 13 adds a second
    * email, ≡ 0 mod 17 a second phone) — so multi-valued documents exist
    * in the fixture and the per-match invariant is load-bearing, not
    * vacuously satisfied by a one-value-per-document corpus (the round-9
    * ADVICE finding: first-match tokens silently rewrote second values). */
  private[graft] def pseudoPlanted: Column = concat(
    col("text"),
    when(col("doc_id") % 7 === 0,
      concat(lit(" contact user"),
        pmod(col("doc_id"), lit(20L)).cast(StringType),
        lit("@example.com now"))).otherwise(lit("")),
    when(col("doc_id") % 13 === 0,
      concat(lit(" cc user"),
        pmod(col("doc_id") + 7L, lit(20L)).cast(StringType),
        lit("@example.com too"))).otherwise(lit("")),
    when(col("doc_id") % 11 === 0,
      concat(lit(" call 555-"),
        format_string("%03d", pmod(col("doc_id"), lit(40L))),
        lit("-"),
        format_string("%04d", pmod(col("doc_id"), lit(40L))),
        lit(" ok"))).otherwise(lit("")),
    when(col("doc_id") % 17 === 0,
      concat(lit(" or 555-"),
        format_string("%03d", pmod(col("doc_id") + 13L, lit(40L))),
        lit("-"),
        format_string("%04d", pmod(col("doc_id") + 13L, lit(40L))),
        lit(" now"))).otherwise(lit("")))

  /** q176 — CONSISTENT PSEUDONYMIZATION: replace each PII value with a
    * STABLE token derived from the value (`<EMAIL:` + md5 prefix + `>`)
    * instead of a class placeholder — redaction (q114/q174) destroys
    * cross-document linkage ("did these two documents cite the same
    * contact?"); pseudonymization preserves it without retaining the
    * value, which is what de-identified corpora that still need entity
    * coreference ship (production swaps the bare hash for an HMAC with
    * a secret key — the OPERATOR shape, value→stable-token substitution,
    * is identical). Hash-derived tokens keep the pass MAP-ONLY and
    * stateless at any corpus size — no corpus-wide entity dictionary,
    * no global rank over distinct values — and consistency is free:
    * equal values hash equally everywhere, across documents, batches,
    * and engines. PER-MATCH: each distinct value in a document is
    * rewritten with its OWN token (docs ≡ 0 mod 13/17 plant a second
    * distinct email/phone precisely to keep that claim tested).
    *
    * The plant is SHARED on purpose (email local part keyed by doc_id
    * mod 20, phone digits by doc_id mod 40): ~20 distinct emails across
    * all planted docs, so many documents share each value and the
    * linkage-preservation claim is non-vacuous — PiiScrubSpec asserts
    * flagged docs ≫ distinct pseudonyms, that equal plants map to equal
    * tokens, and that two-value docs keep both values' tokens distinct.
    * Oracle: identical list_distinct/list_sort/list_reduce + md5
    * arithmetic in DuckDB. */
  def q176(spark: SparkSession, dir: String): DataFrame =
    piiPseudonymize(t(spark, dir, "documents")
      .select(col("doc_id").cast(LongType), pseudoPlanted.as("raw")))
      .orderBy(col("doc_id"))
}
