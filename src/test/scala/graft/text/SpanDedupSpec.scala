package graft.text

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTest

/** q139 against a hand-worked golden (the oracle cross-checks engines;
  * this pins the SEMANTICS — what "covered by a repeated span" means). */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("spandedup").toString
    import spark.implicits._
    Seq(
      // d0: "a b c a b c d" — 'a b c' repeats at p=4 ⇒ drop pos 4,5,6,
      //     kept "a b c d" (first occurrence + trailing d)
      (0L, "a b c a b c d", "en", "s", 13L),
      // d1: no repeats — untouched
      (1L, "p q r s t", "en", "s", 9L),
      // d2: "x y x y x y" — 'x y x' repeats at p=3 ⇒ drop 3,4,5;
      //     'y x y' repeats at p=4 (min 2) ⇒ drop 4,5,6; kept pos 1,2
      (2L, "x y x y x y", "en", "s", 11L),
      // d3: shorter than n ⇒ zero grams, untouched
      (3L, "u v", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q139 drops exactly the positions covered by non-first occurrences") {
    val got = TextAnalysis.q139(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
      .toSeq
    assert(got === Seq(
      (0L, 7L, 3L, "a b c d"),
      (1L, 5L, 0L, "p q r s t"),
      (2L, 6L, 4L, "x y"),
      (3L, 2L, 0L, "u v")))
  }

  test("q139 is non-vacuous on the synthetic corpus") {
    val dropped = TextAnalysis.q139(spark, SparkTest.sf0001)
      .where(col("n_dropped") > 0).count()
    assert(dropped > 0, "fixture must exercise the removal path")
  }

  private lazy val crossDir: String = {
    val dir = Files.createTempDirectory("crossdoc").toString
    import spark.implicits._
    Seq(
      // d0 holds the first occurrence of 'a b c' — untouched
      (0L, "a b c d e", "en", "s", 9L),
      // d1 repeats d0's 'a b c' at p=1 ⇒ drop pos 1,2,3; kept "x y"
      (1L, "a b c x y", "en", "s", 9L),
      // d2: intra-doc repeat ('z z z' at p=2 > minp=1) ⇒ drop 2,3,4
      (2L, "z z z z", "en", "s", 7L),
      // d3 repeats 'a b c' at p=3 ⇒ drop 3,4,5; its own 'x y a'/'y a b'
      //   are globally first ⇒ kept "x y"
      (3L, "x y a b c", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q142 drops positions covered by any globally non-first occurrence") {
    val got = TextAnalysis.q142(spark, crossDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
      .toSeq
    assert(got === Seq(
      (0L, 5L, 0L, "a b c d e"),
      (1L, 5L, 3L, "x y"),
      (2L, 4L, 3L, "z"),
      (3L, 5L, 3L, "x y")))
  }

  test("q142 removes at least as much as the intra-doc form q139") {
    val intra = TextAnalysis.q139(spark, SparkTest.sf0001)
      .select(col("doc_id"), col("n_dropped").as("intra"))
    val cross = TextAnalysis.q142(spark, SparkTest.sf0001)
      .select(col("doc_id"), col("n_dropped").as("cross"))
    val violations = intra.join(cross, "doc_id")
      .where(col("cross") < col("intra")).count()
    assert(violations === 0,
      "cross-document coverage strictly contains intra-document coverage")
    val crossOnly = intra.join(cross, "doc_id")
      .where(col("cross") > col("intra")).count()
    assert(crossOnly > 0, "corpus must exercise the cross-document path")
  }

  // ---- production-n run (VERDICT r8 #6): a verbatim 60-token license
  // header planted on EVERY document, q142 at n = 50. The scale claim
  // under test is the per-gram fan-in collapse: a gram's work is its
  // document frequency — boilerplate duplicated D times costs D posting
  // rows per gram, never D² pair rows — so df of each pure-header gram
  // must equal the duplication depth exactly, and every non-first doc
  // must lose its full header span.

  /** 60 deterministic lowercase letters-only words (the [^a-z]+
    * tokenizer splits digits, so generated suffixes stay alphabetic). */
  private val headerToks: Seq[String] =
    (0 until 60).map(i => "boiler" + ('a' + i / 26).toChar + ('a' + i % 26).toChar)
  private val header = headerToks.mkString(" ")

  private def plantedDir(srcDir: String): String = {
    val dir = Files.createTempDirectory("boilerplate").toString
    graft.core.Tables(spark, srcDir, "documents")
      .withColumn("text", concat(lit(header + " "), col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  for ((sfName, src) <- Seq("sf0.001" -> SparkTest.sf0001,
                            "sf0.01" -> SparkTest.sf001))
    test(s"q142 at n=50 collapses the planted license header ($sfName)") {
      val dir = plantedDir(src)
      val docsN = graft.core.Tables(spark, dir, "documents").count()
      // fan-in fact: each of the 11 pure-header 50-grams has df exactly
      // = the duplication depth (every doc carries it once)
      val headerGrams = (0 to 10).map(i =>
        headerToks.slice(i, i + 50).mkString(" "))
      val df = graft.core.Tables(spark, dir, "documents")
        .select(col("doc_id"), TextAnalysis.toks(col("text")).as("tk"))
        .where(size(col("tk")) >= 50)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(tk) - 49),
            |  i -> concat_ws(' ', slice(tk, i, 50)))""".stripMargin)).as("g"))
        .where(col("g").isin(headerGrams: _*))
        .groupBy(col("g")).agg(countDistinct(col("doc_id")).as("df"))
        .collect()
      assert(df.length == 11, s"expected 11 pure-header grams, got ${df.length}")
      df.foreach(r => assert(r.getLong(1) == docsN,
        s"gram df ${r.getLong(1)} != duplication depth $docsN"))

      val got = TextAnalysis.q142(spark, dir, n = 50).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
      assert(got.length == docsN)
      val minId = got.map(_._1).min
      got.foreach { case (id, nTok, nDropped, prefix) =>
        if (id == minId)
          // the globally-first doc KEEPS its header (first occurrence)
          assert(prefix.startsWith(headerToks.head),
            s"first doc $id lost its header: '$prefix'")
        else
          // everyone else loses the full 60-token header span at least
          assert(nDropped >= 60,
            s"doc $id dropped only $nDropped < 60 header tokens (n_tok $nTok)")
      }
    }
}
