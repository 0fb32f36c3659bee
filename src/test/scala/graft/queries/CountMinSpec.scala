package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTest

/** q143 count-min sketch: the one-sided estimator guarantee (est ≥ true,
  * always), exactness when the sketch is wide enough to be collision-free,
  * and non-vacuity of the collision path on the synthetic corpus. Values
  * themselves are oracle-checked in DuckDB (the hash is portable). */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("q143 estimates never undercount (CMS one-sided guarantee)") {
    val under = Curation.q143(spark, SparkTest.sf0001)
      .where(col("est_n") < col("true_n")).count()
    assert(under === 0)
  }

  test("q143 collision path is non-vacuous at w=16 on the corpus") {
    // 31-word vocab into 16 buckets: some top word must overcount
    val over = Curation.q143(spark, SparkTest.sf0001)
      .where(col("overcount") > 0).count()
    assert(over > 0, "sketch width must force at least one collision")
  }

  private lazy val tinyDir: String = {
    val dir = Files.createTempDirectory("countmin").toString
    import spark.implicits._
    Seq(
      (0L, "alpha alpha beta", "en", "s", 16L),
      (1L, "beta gamma", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("cmGrid is mergeable: slice grids sum cell-wise to the corpus grid") {
    val docs = spark.read.parquet(s"${SparkTest.sf0001}/documents.parquet")
    val whole = Curation.cmGrid(docs).withColumnRenamed("cnt", "w_cnt")
    val merged = Curation.cmGrid(docs.where(col("doc_id") % 2 === 0))
      .unionByName(Curation.cmGrid(docs.where(col("doc_id") % 2 =!= 0)))
      .groupBy(col("r"), col("bucket")).agg(sum(col("cnt")).as("m_cnt"))
    val diff = whole.join(merged, Seq("r", "bucket"), "full_outer")
      .where(coalesce(col("w_cnt"), lit(0L)) =!=
        coalesce(col("m_cnt"), lit(0L))).count()
    assert(diff === 0L)
  }

  test("q143 is exact when the sketch is collision-free") {
    // 3 distinct words into w=4096 buckets x 4 rows: a collision in all
    // 4 rows is impossible to arrange with 3 keys unless the hash is
    // degenerate — every estimate must equal the true count
    val rows = Curation.q143(spark, tinyDir, w = 4096).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet === Set(
      ("alpha", 2L, 2L), ("beta", 2L, 2L), ("gamma", 1L, 1L)))
  }
}
