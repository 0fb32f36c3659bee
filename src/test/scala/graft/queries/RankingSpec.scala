package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** TF-IDF / BM25 / bigrams against hand-computed goldens on a micro
  * corpus — an independent re-derivation of the scoring math (the DuckDB
  * oracle already cross-checks engines; this pins the FORMULA, so a bug
  * that changed both sides identically would still be caught). */
class RankingSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  // micro corpus with known token counts:
  //   d0: "alpha beta alpha"      -> alpha:2 beta:1          (dl=3)
  //   d1: "beta gamma"            -> beta:1 gamma:1          (dl=2)
  //   d2: "alpha alpha alpha bee" -> alpha:3 bee:1           (dl=4)
  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("ranking").toString
    import spark.implicits._
    Seq(
      (0L, "alpha beta alpha", "en", "srcA", 16L),
      (1L, "beta gamma", "en", "srcA", 10L),
      (2L, "alpha alpha alpha bee", "en", "srcB", 21L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    dir
  }

  test("q73 tf-idf matches hand-computed smoothed-idf scores") {
    val n = 3.0
    def idf(df: Double): Double = math.log((n + 1.0) / (df + 1.0)) + 1.0
    def score(tf: Long, df: Double): Double =
      BigDecimal(tf.toDouble * idf(df))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    val got = Ranking.q73(spark, fixtureDir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    // d0: alpha tf=2 df=2, beta tf=1 df=2 — alpha scores higher
    assert(got((0L, 1)) == ("alpha", 2L, 2L, score(2, 2)))
    assert(got((0L, 2)) == ("beta", 1L, 2L, score(1, 2)))
    // d1: gamma (df=1, rarer) outranks beta (df=2) at equal tf
    assert(got((1L, 1)) == ("gamma", 1L, 1L, score(1, 1)))
    assert(got((1L, 2)) == ("beta", 1L, 2L, score(1, 2)))
    // d2: alpha tf=3 outranks bee tf=1 despite bee's rarity
    assert(got((2L, 1)) == ("alpha", 3L, 2L, score(3, 2)))
    assert(got((2L, 2)) == ("bee", 1L, 1L, score(1, 1)))
    assert(got.size == 6) // 2 terms per doc, 3 docs, top-5 cap unhit
  }

  test("q74 bm25 matches hand-computed scores and ranking") {
    val k1 = 1.2; val b = 0.75
    val n = 3.0; val avgdl = (3.0 + 2.0 + 4.0) / 3.0
    def idf(df: Double): Double = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def part(tf: Double, df: Double, dl: Double): BigDecimal =
      BigDecimal(idf(df) * ((tf * (k1 + 1.0)) /
        (tf + k1 * ((1.0 - b) + b * dl / avgdl))))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    def bm25(parts: BigDecimal*): Double =
      BigDecimal(parts.sum.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    // query terms: alpha, beta ("scan data merge" are absent from the
    // micro corpus — pass the terms explicitly)
    val got = Ranking.q74(spark, fixtureDir, terms = Seq("alpha", "beta"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    // df(alpha)=2, df(beta)=2
    val exp = Map(
      0L -> bm25(part(2, 2, 3), part(1, 2, 3)), // alpha + beta
      1L -> bm25(part(1, 2, 2)),                // beta only
      2L -> bm25(part(3, 2, 4)))                // alpha only
    got.foreach { case (id, s, hits) =>
      assert(s == exp(id), s"doc $id: got $s want ${exp(id)}")
      assert(hits == (if (id == 0L) 2 else 1))
    }
    // ranking is by score descending
    assert(got.map(_._2).toSeq == got.map(_._2).sortBy(-_).toSeq)
  }

  test("q75 bigram counts match the adjacency golden") {
    val got = TextQueries.q75(spark, fixtureDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "alpha beta" -> 1L, "beta alpha" -> 1L, // d0
      "beta gamma" -> 1L,                     // d1
      "alpha alpha" -> 2L, "alpha bee" -> 1L  // d2
    ))
    // total bigrams = sum over docs of (n_tokens - 1)
    assert(got.values.sum == (3 - 1) + (2 - 1) + (4 - 1))
  }

  test("q96 rrf fusion: ranks equal the source rankings, score recomputes from ranks") {
    def r(x: Double, sc: Int): Double =
      BigDecimal(x).setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dir = graft.SparkTest.sf0001
    val fused = Ranking.q96(spark, dir).collect()
      .map(x => x.getLong(0) -> (x.getInt(1), x.getInt(2), x.getDouble(3)))
    assert(fused.nonEmpty)
    // bm25 ranks must be exactly q74's top-25 positions
    val bmOrder = Ranking.q74(spark, dir).collect().map(_.getLong(0)).toSeq
    val gotBm = fused.filter(_._2._1 > 0).sortBy(_._2._1).map(_._1).toSeq
    assert(gotBm == bmOrder, "bm25 rank order diverges from q74")
    // rrf recomputes from the two ranks with the declared k = 60
    fused.foreach { case (id, (rb, rt, rrf)) =>
      def c(rank: Int): BigDecimal =
        if (rank > 0) BigDecimal(r(1.0 / (60.0 + rank), 8)) else BigDecimal(0)
      assert(rrf == r((c(rb) + c(rt)).toDouble, 6), s"doc $id")
      assert(rb > 0 || rt > 0, s"doc $id in neither list")
    }
    // output is sorted by rrf desc then doc_id
    val pairs = fused.map { case (id, (_, _, v)) => (v, id) }.toSeq
    assert(pairs == pairs.sortBy { case (v, id) => (-v, id) }, "rrf order broken")
  }

  test("q119 sparse cosine matches hand-computed integer-exact weights") {
    // d0/d1 share 2 of their 3 trigrams; d2 is disjoint.
    //   trigram dfs: "a b c"=2, "b c d"=2, "c d e"=1, "c d f"=1,
    //                "x y z"=1, "y z w"=1;  N = 3
    val dir = Files.createTempDirectory("sparse").toString
    import spark.implicits._
    Seq(
      (0L, "a b c d e", "en", "srcA", 9L),
      (1L, "a b c d f", "en", "srcA", 9L),
      (2L, "x y z w", "en", "srcB", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    def wi(df: Double): Long =
      BigDecimal(1.0 * (math.log(4.0 / (df + 1.0)) + 1.0) * 10000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val (w2, w1) = (wi(2.0), wi(1.0))
    val n2 = 2 * w2 * w2 + w1 * w1      // identical for d0 and d1
    val dot = 2 * w2 * w2
    val want = BigDecimal(dot.toDouble / (math.sqrt(n2.toDouble) * math.sqrt(n2.toDouble)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Ranking.q119(spark, dir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(got.toSeq == Seq((0L, 1L, want)))
    assert(want >= 0.5 && want < 1.0)   // the fixture exercises the cut
  }

  test("q124 incremental labels equal a driver-side corpus-model recomputation") {
    val dir = graft.SparkTest.sf0001
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val grams: Map[Long, Map[String, Long]] = docs.map { case (id, text) =>
      val tk = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      val g = if (tk.length < 3) Seq.empty[String]
              else tk.sliding(3).map(_.mkString(" ")).toSeq
      id -> g.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    }.toMap
    val corpusIds = docs.map(_._1).filter(id => id % 10 < 7).toSet
    val nDocs = corpusIds.size.toDouble
    val df: Map[String, Long] = grams
      .filter { case (id, _) => corpusIds(id) }
      .toSeq.flatMap(_._2.keys).groupBy(identity)
      .map { case (g, xs) => g -> xs.size.toLong }
      .withDefaultValue(0L)
    def vec(id: Long): Map[String, Long] =
      grams(id).collect { case (g, tf) if df(g) <= 50 =>
        g -> BigDecimal(tf.toDouble *
            (math.log((nDocs + 1.0) / (df(g) + 1.0)) + 1.0) * 10000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
    val n2: Map[Long, Long] =
      docs.map { case (id, _) => id -> vec(id).values.map(w => w * w).sum }.toMap
    def near(a: Long, b: Long): Boolean = {
      val (va, vb) = (vec(a), vec(b))
      val dot = va.keysIterator.filter(vb.contains).map(g => va(g) * vb(g)).sum
      dot > 0 &&
        r6(dot.toDouble / (math.sqrt(n2(a).toDouble) * math.sqrt(n2(b).toDouble))) >= 0.5
    }
    val batchIds = docs.map(_._1).filterNot(corpusIds).sorted
    val want = batchIds.map { id =>
      val status =
        if (corpusIds.exists(c => near(id, c))) "neardup_corpus"
        else if (batchIds.exists(e => e < id && near(id, e))) "neardup_batch"
        else "new"
      id -> status
    }
    val got = Ranking.q124(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(got == want.toSeq)
    assert(got.map(_._2).toSet ==
      Set("neardup_corpus", "neardup_batch", "new"),
      "fixture must exercise all three labels")
  }

  test("q138 Kneser-Ney is a proper distribution: per-context mass sums to 1") {
    // Σ_{w2 observed} P_KN(w2|w1) + (D·nf/c1)·(1 − Σ_{w2 observed} Pcont(w2))
    // must equal 1 for every context w1 — the defining property of
    // interpolated KN (the held-out mass goes to unseen continuations).
    val dir = SparkTest.sf0001
    val full = Ranking.q138(spark, dir, topK = Int.MaxValue)
    val bg = full.groupBy("w1").agg(
      sum("pkn").as("s_obs"), count(lit(1)).as("nf"), sum("cnt").as("c1"))
    // Pcont(w2) = np/N over the same model
    val prec = full.groupBy("w2").agg(count(lit(1)).as("np"))
    val n = full.count().toDouble
    val pc = full.join(prec, Seq("w2"))
      .groupBy("w1").agg(sum(col("np") / n).as("s_pc"))
    val viol = bg.join(pc, Seq("w1"))
      .withColumn("total", col("s_obs") +
        (lit(0.75) * col("nf") / col("c1")) * (lit(1.0) - col("s_pc")))
      .where(abs(col("total") - 1.0) > 0.01).count()
    assert(viol === 0L)
  }

  test("q146 KN scoring covers every multi-token doc, ranks rare text worse") {
    import spark.implicits._
    val dir = Files.createTempDirectory("knscore").toString
    Seq(
      // d0 is built from the corpus-dominant bigram (the, cat)
      (0L, "the cat the cat the cat", "en", "s", 23L),
      (1L, "the cat sat", "en", "s", 11L),
      // d2's bigrams are all singleton types -> low P_KN -> high nll
      (2L, "zig zag zog zup", "en", "s", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    val rows = Ranking.q146(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet === Set(0L, 1L, 2L))
    assert(rows(0L)._1 === 5L && rows(1L)._1 === 2L && rows(2L)._1 === 3L)
    assert(rows.values.forall(_._2 > 0.0), "nll positive: every P_KN < 1")
    assert(rows(0L)._2 < rows(2L)._2,
      "frequent-bigram text must score a lower KN nll than singleton text")
  }

  test("q152 counts the planted triangle exactly once, wedges close") {
    import spark.implicits._
    val dir = Files.createTempDirectory("tri").toString
    val clique = "red fox jumps over lazy dog quickly today"
    val pair = "blue whale swims deep ocean water"
    Seq(
      (0L, clique, "en", "s", 1L), (1L, clique, "en", "s", 1L),
      (2L, clique, "en", "s", 1L),
      (3L, pair, "en", "s", 1L), (4L, pair, "en", "s", 1L),
      (5L, "metal spoon fork plate cup", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    // identical triple -> 3-clique; identical pair -> 1 edge; d5 isolated
    val r = Ranking.q152(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) === ((5L, 4L, 1L, 3L, 1.0d)))
  }

  test("q152 invariants on the corpus: each triangle closes a wedge") {
    val r = Ranking.q152(spark, "/root/testdata/sf0.01").collect()(0)
    assert(r.getLong(2) <= r.getLong(3), "triangles cannot exceed wedges")
    assert(r.getLong(1) >= r.getLong(2), "each triangle needs 3 edges")
  }

  test("q154 credits each clique vertex; degree-1 nodes get NULL cc") {
    import spark.implicits._
    val dir = Files.createTempDirectory("lcc").toString
    val clique = "red fox jumps over lazy dog quickly today"
    val pair = "blue whale swims deep ocean water"
    Seq(
      (0L, clique, "en", "s", 1L), (1L, clique, "en", "s", 1L),
      (2L, clique, "en", "s", 1L),
      (3L, pair, "en", "s", 1L), (4L, pair, "en", "s", 1L),
      (5L, "metal spoon fork plate cup", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    val rows = Ranking.q154(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(rows === Seq(
      (0L, 2L, 1L, Some(1.0)), (1L, 2L, 1L, Some(1.0)),
      (2L, 2L, 1L, Some(1.0)),
      (3L, 1L, 0L, None), (4L, 1L, 0L, None)))
  }

  test("graph tier is partition-count invariant: q152/q154 identical at P=3 and P=5") {
    // the wedge self-join and the closing probe are the tier's newest
    // shuffle-heavy shapes — their outputs are integer counts and must
    // not depend on how the shuffle splits them (the q103 P-sweep
    // convention, extended to the graph tier per the round-8 directive)
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    val b = org.apache.spark.sql.graftbridge.Bridge
    try {
      val runs = Seq("3", "5").map { p =>
        spark.conf.set(key, p)
        val tri = Ranking.q152(spark, SparkTest.sf0001)
        val cc = Ranking.q154(spark, SparkTest.sf0001)
        val rows = (tri.collect().map(_.toSeq).toSeq,
          cc.collect().map(_.toSeq).toSeq)
        b.unpersistLocalCheckpoint(tri)
        b.unpersistLocalCheckpoint(cc)
        rows
      }
      assert(runs(0)._1 == runs(1)._1, "q152 output depends on partition count")
      assert(runs(0)._2 == runs(1)._2, "q154 output depends on partition count")
      assert(runs(0)._2.nonEmpty)
    } finally spark.conf.set(key, saved)
  }

  test("q210 PMI matches a driver-side recomputation from raw bigram counts") {
    val dir = SparkTest.sf0001
    val out = Ranking.q210(spark, dir, minCount = 2L, topK = 20)
    val got = out.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(out)
    assert(got.nonEmpty, "fixture must produce collocations at minCount=2")
    // independent replay: tokenize driver-side, count, same pinned
    // (c12*N)/(c1*c2) operation order into Math.log
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("text")).collect()
      .map(_.getString(0).toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
    val bg = toks.flatMap(ws => ws.dropRight(1).zip(ws.drop(1)))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    val c1 = bg.groupBy(_._1._1).map { case (w, xs) => w -> xs.values.sum }
    val c2 = bg.groupBy(_._1._2).map { case (w, xs) => w -> xs.values.sum }
    val n = bg.values.sum
    got.foreach { case (w1, w2, c12, pmi) =>
      assert(bg((w1, w2)) == c12, s"count of ($w1,$w2)")
      val want = BigDecimal(math.log(
        (c12.toDouble * n.toDouble) / (c1(w1).toDouble * c2(w2).toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(pmi == want, s"pmi($w1,$w2): engine $pmi vs replay $want")
    }
    // the ranking is by count with lexicographic ties
    val counts = got.map(_._3)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }
}
