package graft.text


import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTest

/** q145 BPE merges: the greedy-leftmost closed form against hand-worked
  * goldens (the subtle case is a run of equal symbols, where candidate
  * merges overlap), and a full 3-iteration training trace. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def applied(syms: Seq[String], l: String, r: String): Seq[String] = {
    import spark.implicits._
    Seq(Tuple1(syms)).toDF("t")
      .withColumn("mf", Bpe.mergeFlags("t", l, r))
      .withColumn("out", Bpe.applyMerge("t", "mf", l, r))
      .collect()(0).getSeq[String](2)
  }

  test("greedy-leftmost merge within an equal-symbol run") {
    assert(applied(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(applied(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(applied(Seq("a", "a", "a", "a", "a"), "a", "a")
      === Seq("aa", "aa", "a"))
  }

  test("non-overlapping matches all merge; non-matches pass through") {
    assert(applied(Seq("x", "a", "b", "a", "b"), "a", "b")
      === Seq("x", "ab", "ab"))
    assert(applied(Seq("a", "b"), "c", "d") === Seq("a", "b"))
    assert(applied(Seq("a"), "a", "a") === Seq("a"))
  }

  test("q145 learns the hand-worked merge sequence, then stops at exhaustion") {
    // the machinery over a controlled vocabulary (q145 itself runs over
    // the augmented corpus — bpeMergesOf is the shared trainer)
    import spark.implicits._
    val words = Seq("aaab", "aaab", "ab").toDF("word")
    val got = Bpe.bpeMergesOf(words, iters = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // vocab {aaab: 2, ab: 1}:
    //   iter1 pairs: (a,a) 2*2=4, (a,b) 2+1=3  -> merge (a,a), n=4
    //   iter2: aaab=[aa,a,b], ab=[a,b]: (aa,a) 2, (a,b) 2+1=3 -> (a,b), n=3
    //   iter3: aaab=[aa,ab], ab=[ab]: (aa,ab) 2 -> (aa,ab), n=2
    //   iter4: every entry a single symbol -> EXHAUSTED, 3 rows at depth 8
    assert(got === Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)))
  }

  /** Greedy-leftmost BPE reimplemented in plain driver-side Scala — an
    * independent reference for the depth run (no Spark expressions, no
    * closed form: a literal left-to-right scan). */
  private def refBpe(vocab: Seq[(Vector[String], Long)], iters: Int)
      : Seq[(Int, String, String, String, Long)] = {
    def applyGreedy(t: Vector[String], l: String, r: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < t.length) {
        if (i + 1 < t.length && t(i) == l && t(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += t(i); i += 1 }
      }
      out.result()
    }
    var v = vocab
    (1 to iters).iterator.map { rank =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      v.foreach { case (t, c) =>
        var i = 0
        while (i + 1 < t.length) {
          counts((t(i), t(i + 1))) = counts.getOrElse((t(i), t(i + 1)), 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) None
      else {
        val ((l, r), n) = counts.toSeq
          .minBy { case ((l, r), n) => (-n, l, r) }
        v = v.map { case (t, c) => (applyGreedy(t, l, r), c) }
        Some((rank, l, r, l + r, n))
      }
    }.takeWhile(_.isDefined).flatten.toSeq
  }

  test("q145 at depth 8 matches the independent driver-side reference on the corpus") {
    val corpus = SparkTest.sf0001
    // the reference replays the SHIPPED q145's input: the augmented
    // vocabulary-rich stream (round 11), not the 31-word raw fixture
    val vocab = TextAnalysis.augmentedWords(spark, corpus)
      .select(col("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0).split("").toVector, r.getLong(1))).toSeq
    val want = refBpe(vocab, 8)
    assert(want.size == 8, s"corpus exhausted early: ${want.size} merges")
    val got = Bpe.q145(spark, corpus, iters = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === want)
  }

  test("per-round plan depth is O(1): node count constant across 8 checkpointed rounds") {
    val corpus = SparkTest.sf0001
    var vocab = graft.core.Tables(spark, corpus, "documents")
      .select(explode(TextAnalysis.toks(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("t", filter(split(col("word"), ""), x => x =!= ""))
      .select(col("cnt"), col("t"))
      .localCheckpoint()
    val depths =
      try {
        (1 to 8).map { _ =>
          val (_, next) = Bpe.step(vocab)
            .getOrElse(fail("vocab exhausted before round 8"))
          val d = next.queryExecution.optimizedPlan.collect { case p => p }.size
          val cp = next.localCheckpoint()
          org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(vocab)
          vocab = cp
          d
        }
      } finally {
        org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(vocab)
      }
    assert(depths.distinct.size == 1,
      s"plan depth grows across rounds: $depths — checkpoint discipline broken")
  }

  test("q165 at iters=0 is the character tokenizer (n_tokens == n_chars) and the sweep is lossless") {
    val corpus = SparkTest.sf0001
    val zero = Bpe.q165(spark, corpus, iters = 0)
    val rows = zero.collect()
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(zero)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) === r.getLong(3),
        s"${r.getString(0)}: char tokenizer must emit one token per char")
      assert(r.getDouble(6) === 1.0)
    }
    // lossless sweep at depth: encoding compresses but never changes the
    // word/char totals, and deeper merges only shrink the token count
    val deep = Bpe.q165(spark, corpus, iters = 8)
    val d = deep.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(deep)
    val z = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(d.keySet === z.keySet)
    d.foreach { case (src, (words, toks, chars)) =>
      assert(words === z(src)._1, s"$src word total changed")
      assert(chars === z(src)._3, s"$src char total changed")
      assert(toks <= z(src)._2, s"$src merges must not grow token count")
      assert(toks >= words, s"$src at least one token per word")
    }
  }
}
