package graft.text

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTest

/** q144 DSIR importance weights: the resampling ORDER the weights induce
  * (target-like raw text above target-divergent raw text) and row
  * accounting. Exact values are oracle-checked in DuckDB. */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("dsir").toString
    import spark.implicits._
    Seq(
      (0L, "the cat sat on the mat", "en", "s", 22L),
      (1L, "the dog sat on the rug", "en", "s", 22L),
      // raw doc whose bigrams mirror the target distribution
      (2L, "the cat sat on the rug", "de", "s", 22L),
      // raw doc disjoint from the target distribution
      (3L, "zig zag zog zup zip zap", "de", "s", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q144 ranks target-like raw text above target-divergent raw text") {
    val rows = Classifier.q144(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows.map(_._1) === Seq(2L, 3L), "only raw (non-en) docs scored")
    assert(rows.forall(_._2 === 5L), "6 tokens -> 5 bigram features")
    val byDoc = rows.map(t => t._1 -> t._3).toMap
    assert(byDoc(2L) > byDoc(3L),
      "importance weight must favor the target-like document")
  }

  test("q144 scores every raw doc with >= 2 tokens, and only those") {
    val expected = spark.read
      .parquet(s"${SparkTest.sf0001}/documents.parquet")
      .where(col("lang") =!= "en")
      .where(size(filter(split(lower(col("text")), "[^a-z]+"),
        w => w =!= "")) >= 2)
      .count()
    assert(Classifier.q144(spark, SparkTest.sf0001).count() === expected)
  }
}
