package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q104 — q94's bigram-LM scoring at stop-word-skew shape (materialized
  * bigram model + algebraic corpus counts + salted joins instead of
  * corpus-scale window partitions).
  *
  * The mitigation is only shippable if it is EQUAL: same arithmetic, same
  * rows, on both the real fixture and a deliberately skewed corpus where
  * one stop context dominates. Plus the storage contract: the bigram
  * model is freed inside the query; only the direct result checkpoint
  * remains, freeable to zero.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("q104 equals q94 row-for-row on sf0.001") {
    val dir = SparkTest.sf0001
    val plain = rows(Ranking.q94(spark, dir))
    val out = Ranking.q104(spark, dir)
    val salted = rows(out)
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(out)
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("q104 equals q94 on a stop-context-skew micro corpus") {
    // "the X" for many distinct X: the (w1='the') context partition holds
    // nearly every bigram row — exactly the shape q94's window funnels
    // through one task and q104's salt spreads over nSalts partitions
    val tmp = Files.createTempDirectory("skew").toString
    import spark.implicits._
    val docs = (1L to 12L).map { i =>
      val sb = new StringBuilder
      (0 until 40).foreach { j => sb.append("the w").append((i + j) % 17).append(' ') }
      sb.append("tail").append(i % 3)
      (i, sb.toString, "en", "srcA", sb.length.toLong)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(tmp + "/documents.parquet")
    val plain = rows(Ranking.q94(spark, tmp))
    val out = Ranking.q104(spark, tmp, nSalts = 4)
    val salted = rows(out)
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(out)
    assert(salted == plain)
    assert(plain.size == 12)
  }

  test("q104 frees the bigram model; only the result checkpoint remains") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = Ranking.q104(spark, SparkTest.sf0001)
    val n = out.count()
    val pinned = sc.getPersistentRDDs.keySet.diff(before)
    assert(pinned.size <= 1, s"more than the result pinned: $pinned")
    pinned.foreach { id =>
      assert(sc.getPersistentRDDs(id).count() == n,
        "pinned RDD is not the per-doc result")
    }
    assert(
      org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(out),
      "q104 result is not a direct checkpoint (storage contract)")
    assert(sc.getPersistentRDDs.keySet.diff(before).isEmpty,
      "q104 storage not freeable to zero")
  }
}
