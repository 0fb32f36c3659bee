package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q86 decontamination / q87 sequence packing / q88 source mixing /
  * q89 repetition against hand-computed goldens on a micro corpus, plus
  * structural invariants on the sf0.001 corpus. The DuckDB oracle already
  * cross-checks engines; these pin the SEMANTICS (a bug changing both
  * engines identically would still be caught). */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  // micro corpus (doc_id 0 lands in q86's held-out slice: 0 % 50 == 0):
  //   d0 "a b c d"        grams3: {a b c, b c d}           tokens: 4
  //   d1 "a b c x y z"    grams3: {a b c, b c x, c x y, x y z}  tokens: 6
  //   d2 "p q r s"        grams3: {p q r, q r s}           tokens: 4
  //   d3 "a b a b a"      bigrams: a b ×2, b a ×2          tokens: 5
  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("pipelineops").toString
    import spark.implicits._
    Seq(
      (0L, "a b c d", "en", "srcA", 7L),
      (1L, "a b c x y z", "en", "srcA", 11L),
      (2L, "p q r s", "en", "srcB", 7L),
      (3L, "a b a b a", "en", "srcB", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    dir
  }

  test("q86 flags training docs by distinct-3-gram overlap with the held-out slice") {
    val got = graft.text.Decontaminate.q86(spark, fixtureDir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    // d0 is the benchmark slice — never a training row
    assert(!got.contains(0L))
    // d1 shares exactly "a b c" with the benchmark: 1 of 4 grams = 25% ≥ 5%
    assert(got(1L) == ((4L, 1L, 0.25, true)))
    // d2 shares nothing
    assert(got(2L) == ((2L, 0L, 0.0, false)))
    // d3 "a b a b a": distinct grams {a b a, b a b} — no benchmark overlap
    assert(got(3L) == ((2L, 0L, 0.0, false)))
  }

  test("q86 invariants on sf0.001: hits bounded, held-out slice excluded") {
    val rows = graft.text.Decontaminate.q86(spark, SparkTest.sf0001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)), "n_hit > n_grams")
    assert(rows.forall(_.getLong(0) % 50 != 0), "benchmark doc in output")
    // the synthetic corpus shares vocabulary across docs — contamination
    // must actually fire somewhere or the operator tests nothing
    assert(rows.exists(_.getBoolean(4)), "no contaminated doc detected")
  }

  test("q87 packs the concatenated corpus into fixed-size sequences") {
    val got = Curation.q87(spark, fixtureDir, seqLen = 4)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // doc_id order: d0 (4 toks) @0, d1 (6) @4, d2 (4) @10, d3 (5) @14
    assert(got(0L) == ((4L, 0L, 0L, 0L, 1L)))  // tokens 0..3   → seq 0
    assert(got(1L) == ((6L, 4L, 1L, 2L, 2L)))  // tokens 4..9   → seqs 1-2
    assert(got(2L) == ((4L, 10L, 2L, 3L, 2L))) // tokens 10..13 → seqs 2-3
    assert(got(3L) == ((5L, 14L, 3L, 4L, 2L))) // tokens 14..18 → seqs 3-4
  }

  test("q87 offsets are contiguous and P-invariant on sf0.001") {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      val runs = Seq("3", "4").map { p =>
        spark.conf.set(key, p)
        Curation.q87(spark, SparkTest.sf0001).collect().map(_.toSeq).toSeq
      }
      assert(runs(0) == runs(1), "q87 output depends on partition count")
      // contiguity: each doc starts exactly where the previous one ended
      val byId = runs(0).map(s =>
        (s(0).asInstanceOf[Long], s(1).asInstanceOf[Long], s(2).asInstanceOf[Long]))
      byId.sliding(2).foreach {
        case Seq((_, n0, s0), (id1, _, s1)) =>
          assert(s1 == s0 + n0, s"gap before doc $id1")
        case _ =>
      }
    } finally spark.conf.set(key, saved)
  }

  test("q113 removes exactly the above-threshold lines; cleaned text verified by local md5") {
    def localMd5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // micro corpus, minDocs = 2: header (4 docs) and per-source license
    // (2 docs each) cross the threshold; the quote block (doc_id % 100,
    // unique here) and the single body chunk survive.
    val rows = Curation.q113(spark, fixtureDir, minDocs = 2).collect()
    val texts = Map(0L -> "a b c d", 1L -> "a b c x y z",
      2L -> "p q r s", 3L -> "a b a b a")
    assert(rows.length == 4)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 2L, 2L)), s"doc $id counts")
      assert(r.getString(4) ==
        localMd5(s"shared quote block $id\n${texts(id)}"), s"doc $id cleaned")
    }

    // sf0.001 defaults: every doc loses exactly the header + its license
    // line; the freq-5 quote blocks survive (threshold does not nuke all
    // repetition). Dropping the threshold to 4 sweeps the quotes too.
    val full = Curation.q113(spark, SparkTest.sf0001).collect()
    assert(full.length == 500)
    assert(full.forall(_.getLong(2) == 2L), "default threshold: 2 boiler lines/doc")
    // (>= not ==: a handful of body chunks genuinely repeat across 4 docs
    // in the synthetic corpus and are legitimately swept at this threshold)
    val tight = Curation.q113(spark, SparkTest.sf0001, minDocs = 4).collect()
    assert(tight.forall(_.getLong(2) >= 3L), "minDocs=4 must sweep the freq-5 quote blocks")

    // heavy-hitter keys ride back as a broadcast, never a shuffle probe
    val plan = Curation.q113(spark, SparkTest.sf0001).queryExecution.sparkPlan
    assert(plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty, "boiler set must broadcast")
  }

  test("q114 counts and redacts planted PII; digest matches local replaceAll") {
    def localMd5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val texts = Map(0L -> "a b c d", 1L -> "a b c x y z",
      2L -> "p q r s", 3L -> "a b a b a")
    def planted(id: Long): String =
      texts(id) +
        (if (id % 3 == 0) s" contact user$id@example.com now" else "") +
        (if (id % 9 == 0) s" or user${id}b@example.org later" else "") +
        (if (id % 5 == 0) s" call 555-${id % 10000} today" else "")
    val rows = graft.text.TextAnalysis.q114(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    // doc 0 hits all three residue classes (2 emails + 1 phone); doc 3
    // only %3; docs 1/2 are clean
    assert(rows(0L)._1 == 2 && rows(0L)._2 == 1)
    assert(rows(3L)._1 == 1 && rows(3L)._2 == 0)
    assert(rows(1L) == ((0, 0, localMd5(texts(1L)))))
    assert(rows(2L) == ((0, 0, localMd5(texts(2L)))))
    // digest equals an independent local java.util.regex redaction
    (0L to 3L).foreach { id =>
      val expect = planted(id)
        .replaceAll("[a-z0-9]+@[a-z]+\\.[a-z]+", "<EMAIL>")
        .replaceAll("555-[0-9]+", "<PHONE>")
      assert(rows(id)._3 == localMd5(expect), s"doc $id redaction")
    }
  }

  test("q115 packs the same corpus as q87 in md5-shuffle order; offsets contiguous; P-invariant") {
    val q87rows = Curation.q87(spark, SparkTest.sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Curation.q115(spark, SparkTest.sf0001).collect()
    // same doc set, same per-doc token counts, same grand total
    assert(rows.map(_.getLong(0)).toSet == q87rows.keySet)
    rows.foreach(r => assert(r.getLong(1) == q87rows(r.getLong(0))))
    // result order IS the digest permutation, and offsets are contiguous
    // in that order starting at zero
    assert(rows.map(_.getString(2)).toSeq == rows.map(_.getString(2)).toSeq.sorted)
    rows.foldLeft(0L) { (expect, r) =>
      assert(r.getLong(3) == expect, s"doc ${r.getLong(0)} start_tok")
      expect + r.getLong(1)
    }
    // the permutation actually decorrelates: doc_id order must differ
    assert(rows.map(_.getLong(0)).toSeq != rows.map(_.getLong(0)).toSeq.sorted)

    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      val runs = Seq("3", "5").map { p =>
        spark.conf.set(key, p)
        Curation.q115(spark, SparkTest.sf0001).collect().map(_.toSeq).toSeq
      }
      assert(runs(0) == runs(1), "q115 output depends on partition count")
    } finally spark.conf.set(key, saved)
  }

  test("q116 sequence manifest: full sequences sum to seqLen, doc slices tile each doc") {
    val L = 128L
    val rows = Curation.q116(spark, SparkTest.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val maxSeq = rows.map(_._1).max
    // every sequence except the final one is EXACTLY seqLen tokens of
    // slices, and its slices tile [0, L) contiguously in seq_off order
    rows.groupBy(_._1).foreach { case (seqId, slices) =>
      val sorted = slices.sortBy(_._3)
      val total = sorted.map(_._5).sum
      if (seqId != maxSeq) assert(total == L, s"seq $seqId sums to $total")
      sorted.foldLeft(0L) { (expect, s) =>
        assert(s._3 == expect, s"seq $seqId slice at ${s._3}, expected $expect")
        expect + s._5
      }
    }
    // every document's slices tile the document: doc_offs contiguous from
    // zero, slice lengths sum to the doc's q87 token count
    val q87tok = Curation.q87(spark, SparkTest.sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._2).foreach { case (docId, slices) =>
      val sorted = slices.sortBy(_._4)
      sorted.foldLeft(0L) { (expect, s) =>
        assert(s._4 == expect, s"doc $docId slice at doc_off ${s._4}")
        expect + s._5
      }
      assert(sorted.map(_._5).sum == q87tok(docId), s"doc $docId token sum")
    }
  }

  test("q117 chunking: stride offsets, last-chunk coverage, overlap reconstruction") {
    val (w, s) = (32L, 24L)
    val rows = graft.text.TextAnalysis.q117(spark, SparkTest.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.groupBy(_._1).foreach { case (docId, chunks) =>
      val sorted = chunks.sortBy(_._2)
      // chunk ids dense from 0; starts at chunk_id*stride
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c._2 == i && c._3 == i * s, s"doc $docId chunk $i")
      }
      // all but the last chunk are full windows; the last reaches the
      // final token exactly (start + len == n_tok) and is never empty
      sorted.init.foreach(c => assert(c._4 == w, s"doc $docId short mid-chunk"))
      val last = sorted.last
      assert(last._4 > 0 && last._4 <= w)
      // windows overlap by w-s tokens: reconstruct n_tok two ways
      val nTok = last._3 + last._4
      assert(sorted.map(_._4).sum == nTok + (sorted.size - 1) * (w - s),
        s"doc $docId overlap accounting")
    }
  }

  test("q118 exact-quota sample: k per stratum, ascending digests, P-invariant") {
    val rows = graft.functions.TopKAggregator.q118(spark, SparkTest.sf0001).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val bySrc = rows.groupBy(_._1)
    // every stratum fills its quota exactly (each source has >= 5 docs)
    bySrc.foreach { case (src, picks) =>
      assert(picks.map(_._2).sorted.toSeq == (1 to 5), s"$src quota")
      val sorted = picks.sortBy(_._2)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).toSeq.sorted,
        s"$src digests not ascending")
      sorted.foreach(p =>
        assert(p._3 == java.security.MessageDigest.getInstance("MD5")
          .digest(p._4.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString, s"$src key/doc mismatch"))
    }
    // the sampler's bounded-buffer merge is partitioning-independent
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      val runs = Seq("2", "7").map { p =>
        spark.conf.set(key, p)
        graft.functions.TopKAggregator.q118(spark, SparkTest.sf0001)
          .collect().map(_.toSeq).toSeq
      }
      assert(runs(0) == runs(1), "q118 output depends on partition count")
    } finally spark.conf.set(key, saved)
  }

  test("q88 computes sqrt-temperature mixing weights and epoch counts") {
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    // srcA tokens = 4 + 6 = 10, srcB = 4 + 5 = 9
    val wA = r(math.sqrt(10.0), 6)
    val wB = r(math.sqrt(9.0), 6)
    val tot = BigDecimal(wA) + BigDecimal(wB) // exact decimal sum
    val weightA = r(wA / tot.toDouble, 4)
    val weightB = r(wB / tot.toDouble, 4)
    val got = Curation.q88(spark, fixtureDir, budgetTokens = 100L)
      .collect()
      .map(r0 => r0.getString(0) ->
        (r0.getLong(1), r0.getLong(2), r0.getDouble(3), r0.getDouble(4)))
      .toMap
    assert(got("srcA") == ((2L, 10L, weightA, r(weightA * 100 / 10.0, 4))))
    assert(got("srcB") == ((2L, 9L, weightB, r(weightB * 100 / 9.0, 4))))
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-3)
  }

  test("q89 bigram repetition stats match hand-computed goldens") {
    val got = graft.text.TextAnalysis.repetitionStats(spark, fixtureDir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
      .toMap
    // d3 "a b a b a": 4 bigrams, 2 distinct, top count 2 → dup 0.5, rep
    assert(got(3L) == ((4L, 2L, 2L, 0.5, 0.5, true)))
    // d0 "a b c d": all 3 bigrams unique
    assert(got(0L) == ((3L, 3L, 1L, 0.0, 0.3333, false)))
    // d1: 5 unique bigrams
    assert(got(1L) == ((5L, 5L, 1L, 0.0, 0.2, false)))
    assert(got(2L) == ((3L, 3L, 1L, 0.0, 0.3333, false)))
  }

  test("q90 labels incoming docs against corpus, then within the batch") {
    // ids < 7 are the standing corpus (doc_id % 10 < 7); 7/8/9/17 incoming
    val dir = Files.createTempDirectory("incdedup").toString
    import spark.implicits._
    Seq(
      (0L,  "x y z", "en", "srcA", 5L),             // corpus
      (7L,  "z y x", "en", "srcA", 5L),             // reordered copy of 0
      (8L,  "p q", "en", "srcA", 3L),               // first in batch
      (17L, "q p", "en", "srcA", 3L),               // copy of 8, later id
      (9L,  "unique words here", "en", "srcB", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    val got = graft.dedup.Dedup.q90(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == Map(7L -> "dup_existing", 8L -> "new",
      17L -> "dup_batch", 9L -> "new"))
  }

  test("q90 statuses partition the incoming batch exactly (sf0.001)") {
    val rows = graft.dedup.Dedup.q90(spark, SparkTest.sf0001).collect()
    val n = graft.core.Tables(spark, SparkTest.sf0001, "documents")
      .where(org.apache.spark.sql.functions.col("doc_id") % 10 >= 7).count()
    assert(rows.length == n, "one status row per incoming doc")
    assert(rows.forall(_.getLong(0) % 10 >= 7), "corpus doc leaked into output")
    // keeper rule: every fingerprint's first incoming occurrence is never
    // labeled dup_batch
    val byFp = rows.groupBy(_.getString(1))
    byFp.values.foreach { g =>
      val first = g.minBy(_.getLong(0))
      assert(first.getString(2) != "dup_batch", s"first id ${first.getLong(0)}")
    }
  }

  test("q93 KL divergence matches hand-computed values; zero for a lone source") {
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dir = Files.createTempDirectory("kl").toString
    import spark.implicits._
    // corpus tokens: a×2 b×2 → p(a)=p(b)=1/2
    Seq(
      (0L, "a a b", "en", "srcA", 5L), // srcA: a 2/3, b 1/3
      (1L, "b", "en", "srcB", 1L))     // srcB: b 1
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    val got = graft.text.TextAnalysis.sourceDivergence(spark, dir)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    val klA = r(
      BigDecimal(r(2.0 / 3 * math.log((2.0 / 3) / 0.5), 8)).toDouble +
      BigDecimal(r(1.0 / 3 * math.log((1.0 / 3) / 0.5), 8)).toDouble, 6)
    val klB = r(r(math.log(2.0), 8), 6)
    assert(got("srcA") == ((3L, 2L, klA)))
    assert(got("srcB") == ((1L, 1L, klB)))

    // a single-source corpus diverges from itself by exactly zero
    val dir1 = Files.createTempDirectory("kl1").toString
    Seq((0L, "x y z x", "en", "only", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir1 + "/documents.parquet")
    val lone = graft.text.TextAnalysis.sourceDivergence(spark, dir1).collect()
    assert(lone.length == 1 && lone(0).getDouble(3) == 0.0)
  }

  test("q93 divergences are non-negative up to rounding (sf0.001)") {
    val rows = graft.text.TextAnalysis.sourceDivergence(spark, SparkTest.sf0001)
      .collect()
    assert(rows.nonEmpty)
    // Gibbs' inequality: KL >= 0; per-term 8-decimal rounding can shift
    // the sum by at most n_types * 5e-9
    rows.foreach { x =>
      val slack = x.getLong(2) * 5e-9 + 1e-6
      assert(x.getDouble(3) >= -slack, s"${x.getString(0)}: ${x.getDouble(3)}")
    }
  }

  test("q94 bigram-LM nll matches hand-computed add-one-smoothed scores") {
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dir = Files.createTempDirectory("lm").toString
    import spark.implicits._
    // corpus bigrams: d0 (a,b) (b,a); d1 (b,b)×2
    //   c_b: (a,b)=1 (b,a)=1 (b,b)=2 ; c_u: a=1, b=3 ; V fixed 65536
    Seq(
      (0L, "a b a", "en", "srcA", 5L),
      (1L, "b b b", "en", "srcA", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    val got = Ranking.q94(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    val v = 65536.0 // declared smoothing-vocabulary hyperparameter
    val nll0 = r(
      (BigDecimal(r(-math.log((1.0 + 1) / (1.0 + v)), 8)) + // P(b|a)
        BigDecimal(r(-math.log((1.0 + 1) / (3.0 + v)), 8))  // P(a|b)
        ).toDouble / 2.0, 6)
    val nll1 = r(
      BigDecimal(r(2.0 * -math.log((2.0 + 1) / (3.0 + v)), 8)) // P(b|b) ×2
        .toDouble / 2.0, 6)
    assert(got(0L) == ((2L, nll0)))
    assert(got(1L) == ((2L, nll1)))
  }

  test("q94 nll is positive and bounded by ln of the smoothing floor (sf0.001)") {
    val rows = Ranking.q94(spark, SparkTest.sf0001).collect()
    assert(rows.nonEmpty)
    // every probability is in ((1/(c_u+V)), 1): nll strictly positive and
    // below ln(max c_u + V) — a loose sanity envelope
    rows.foreach { x =>
      val nll = x.getDouble(2)
      assert(nll > 0.0 && nll < 20.0, s"doc ${x.getLong(0)}: nll $nll")
    }
  }

  test("q95 corpus card matches hand-counted micro corpus facts") {
    val dir = Files.createTempDirectory("card").toString
    import spark.implicits._
    Seq(
      (0L, "a b", "en", "srcA", 3L),
      (1L, "a b", "en", "srcA", 3L),   // exact duplicate of 0
      (2L, "c d e", "de", "srcB", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    val r = Curation.q95(spark, dir).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(0) == 3L)          // n_docs
    assert(row.getLong(1) == 2L)          // n_sources
    assert(row.getLong(2) == 2L)          // n_langs
    assert(row.getLong(3) == 11L)         // total_chars
    assert(row.getLong(4) == 7L)          // total_tokens
    assert(row.getDouble(5) == 2.3333)    // avg_doc_tokens
    assert(row.getLong(6) == 2L)          // n_unique_texts
    assert(row.getLong(7) == 1L)          // n_exact_dup_docs
  }

  test("q100 manifest composes its tiers: filters honored, offsets contiguous") {
    val dir = SparkTest.sf0001
    val rows = Curation.q100(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val ids = rows.map(_._1).toSet
    // (c) benchmark slice and q86-contaminated docs never appear
    assert(rows.forall(_._1 % 50 != 0), "benchmark doc in manifest")
    val contaminated = graft.text.Decontaminate.q86(spark, dir)
      .where(col("contaminated")).collect().map(_.getLong(0)).toSet
    assert(contaminated.intersect(ids).isEmpty, "contaminated doc kept")
    // (a) only canonical keepers: no two manifest docs share a fingerprint
    val fps = graft.dedup.Dedup.wordSets(spark, dir)
      .select(col("doc_id"), md5(array_join(col("words"), " ")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val keptFps = ids.toSeq.map(fps)
    assert(keptFps.distinct.size == keptFps.size, "duplicate fingerprint kept")
    // (b) n_tok matches the full-corpus q87 manifest for the same doc
    val full = Curation.q87(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, n, _) =>
      assert(full(id) == n, s"doc $id token count drifted") }
    assert(rows.forall(_._2 >= 10), "sub-10-token doc kept")
    // packing: offsets contiguous over the CURATED order
    rows.sortBy(_._1).toSeq.sliding(2).foreach {
      case Seq((_, n0, s0), (id1, _, s1)) =>
        assert(s1 == s0 + n0, s"gap before doc $id1")
      case _ =>
    }
  }

  test("q107 perplexity-budget selection equals greedy fill over q94's ranking; P-invariant") {
    val dir = SparkTest.sf0001
    val budget = 10000L
    // driver-side greedy fill over q94's (nll, doc_id) order
    val ranked = Ranking.q94(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1) + 1, r.getDouble(2)))
      .sortBy { case (id, _, nll) => (nll, id) }
    var acc = 0L
    val expected = ranked.flatMap { case (id, n, nll) =>
      val start = acc
      if (start < budget) { acc += n; Some((id, nll, n, start)) }
      else { acc += n; None }
    }.toSeq
    assert(expected.nonEmpty && expected.size < ranked.length,
      "budget cut is vacuous on this fixture")

    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      val runs = Seq("3", "5").map { p =>
        spark.conf.set(key, p)
        Curation.q107(spark, dir, budget).collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
          .toSeq
      }
      assert(runs(0) == expected, "q107 diverges from greedy fill")
      assert(runs(0) == runs(1), "q107 output depends on partition count")
    } finally spark.conf.set(key, saved)
  }

  test("q89 top_count is the true per-doc max bigram multiplicity (sf0.001)") {
    // relational recomputation of the in-row linear-scan kernel
    val d = graft.core.Tables(spark, SparkTest.sf0001, "documents")
      .select(col("doc_id"),
        graft.text.TextAnalysis.toks(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(tk) - 1),
          |  i -> concat_ws(' ', element_at(tk, i), element_at(tk, i + 1)))"""
          .stripMargin)).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("top"))
    val want = d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = graft.text.TextAnalysis.repetitionStats(spark, SparkTest.sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == want)
  }

  test("q120 vocab coverage: boundary tie breaks on the word, OOV counts exact") {
    // counts: dog=3, the=2, cat=1, bird=1; topV=3 → third slot is a
    // count tie, broken word-ascending → "bird" enters, "cat" is OOV
    val dir = java.nio.file.Files.createTempDirectory("vocab").toString
    import spark.implicits._
    Seq(
      (0L, "the the cat", "en", "srcA", 11L),
      (1L, "dog dog dog bird", "en", "srcB", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    val got = graft.text.TextAnalysis.q120(spark, dir, topV = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("srcA", 3L, 1L, 0.333333),
      ("srcB", 4L, 0L, 0.0)))
  }

  test("q121 source matrix: hand-computed trigram jaccard, zero-overlap pair absent") {
    // srcA docs: trigrams {a b c, b c d} ∪ {b c d, c d e} → set of 3
    // srcB doc:  trigrams {a b c, b c x}                  → set of 2
    // srcC doc:  trigrams {p q r}                         → disjoint
    // shared(A,B) = {a b c} → J = 1/(3+2-1) = 0.25
    val dir = java.nio.file.Files.createTempDirectory("simmx").toString
    import spark.implicits._
    Seq(
      (0L, "a b c d", "en", "srcA", 7L),
      (1L, "b c d e", "en", "srcA", 7L),
      (2L, "a b c x", "en", "srcB", 7L),
      (3L, "p q r", "en", "srcC", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    val got = graft.text.TextAnalysis.q121(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("srcA", "srcB", 1L, 0.25)),
      s"got ${got.toSeq} — zero-overlap pairs must be absent, A-B must be 0.25")
  }

  test("q123 pack efficiency: hand-packed 3-doc layout at seqLen=4") {
    // tokens: d0=3, d1=3, d2=2 → total 8, 2 sequences of 4.
    // d0 [0,2] seq0; d1 [3,5] SPLITS seq0→seq1; d2 [6,7] seq1.
    val dir = java.nio.file.Files.createTempDirectory("packeff").toString
    import spark.implicits._
    Seq(
      (0L, "a b c", "en", "srcA", 5L),
      (1L, "d e f", "en", "srcA", 5L),
      (2L, "g h", "en", "srcB", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    val df = graft.queries.Curation.q123(spark, dir, seqLen = 4)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4), r.getDouble(5)))
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(df)
    assert(got.toSeq == Seq((3L, 8L, 2L, 1L, 0.333333, 1.0)))
  }
}
