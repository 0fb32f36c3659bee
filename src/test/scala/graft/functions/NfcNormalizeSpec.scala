package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.text.TextAnalysis

/** NFC normalization kernel + q78 accounting: golden Unicode pairs (the
  * gate corpus is ASCII, where NFC is the identity — the interesting
  * cases live here). Literals are written as \u escapes so no editor or
  * toolchain can silently re-normalize the fixtures. */
class NfcNormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private val decomposed = "Cafe\u0301" // e + U+0301 COMBINING ACUTE ACCENT
  private val composed = "Caf\u00e9"    // U+00E9 precomposed

  test("canonical composition goldens (Column API and SQL)") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = Seq((decomposed, composed)).toDF("d", "c")
    val row = df.select(
      NfcNormalizeExpr.nfcNormalize(col("d")).as("nd"),
      NfcNormalizeExpr.nfcNormalize(col("c")).as("nc")).collect()(0)
    assert(row.getString(0) == composed, "decomposed input must compose")
    assert(row.getString(1) == composed, "already-NFC input unchanged")
    df.createOrReplaceTempView("nfc_t")
    val viaSql = spark.sql(
      "SELECT nfc_normalize(d) = nfc_normalize(c) AS eq FROM nfc_t")
      .collect()(0).getBoolean(0)
    assert(viaSql, "SQL surface must agree")
    // ASCII fast path
    val ascii = Seq("plain ascii").toDF("s")
      .select(NfcNormalizeExpr.nfcNormalize(col("s"))).collect()(0).getString(0)
    assert(ascii == "plain ascii")
  }

  test("q78 accounting counts changed docs and the char delta") {
    val dir = Files.createTempDirectory("nfc").toString
    import spark.implicits._
    Seq(
      (0L, decomposed + " au lait", "fr", "srcU", 13L), // composes: 13 -> 12 chars
      (1L, composed + " au lait", "fr", "srcU", 12L),   // already NFC
      (2L, "plain text", "en", "srcA", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    val got = TextAnalysis.nfcStats(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("srcU") == ((2L, 1L, 13L + 12L, 12L + 12L)))
    assert(got("srcA") == ((1L, 0L, 10L, 10L)))
  }
}
