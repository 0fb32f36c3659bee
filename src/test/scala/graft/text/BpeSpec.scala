package graft.text

import java.nio.file.Files

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

  private lazy val dir: String = {
    val d = Files.createTempDirectory("bpe").toString
    import spark.implicits._
    Seq(
      (0L, "aaab aaab", "en", "s", 9L),
      (1L, "ab", "en", "s", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q145 learns the hand-worked merge sequence") {
    val got = Bpe.q145(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // vocab {aaab: 2, ab: 1}:
    //   iter1 pairs: (a,a) 2*2=4, (a,b) 2+1=3  -> merge (a,a), n=4
    //   iter2: aaab=[aa,a,b], ab=[a,b]: (aa,a) 2, (a,b) 2+1=3 -> (a,b), n=3
    //   iter3: aaab=[aa,ab], ab=[ab]: (aa,ab) 2 -> (aa,ab), n=2
    assert(got === Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "aa", "ab", "aaab", 2L)))
  }
}
