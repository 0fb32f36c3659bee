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

  test("q148 per-grid guarantees hold and the split total tightens q143") {
    val docs = spark.read.parquet(s"${SparkTest.sf0001}/documents.parquet")
    import org.apache.spark.sql.functions.{explode, lower, split => ssplit}
    val truth = docs
      .select(col("doc_id"), explode(filter(
        ssplit(lower(col("text")), "[^a-z]+"), w => w =!= "")).as("word"))
      .groupBy(col("word"))
      .agg(
        sum(when(col("doc_id") % 10 < 7, 1L).otherwise(0L)).as("t_base"),
        sum(when(col("doc_id") % 10 >= 7, 1L).otherwise(0L)).as("t_incr"))
    val est = Curation.q148(spark, SparkTest.sf0001)
    val bad = est.join(truth, "word")
      .where(col("est_base") < col("t_base") ||
        col("est_incr") < col("t_incr") ||
        col("est_total") < col("true_n")).count()
    assert(bad === 0L, "one-sided CMS guarantee must hold per grid")
    // sum of per-grid mins is a TIGHTER upper bound than the merged grid
    val merged = Curation.q143(spark, SparkTest.sf0001)
      .select(col("word"), col("est_n"))
    val looser = est.join(merged, "word")
      .where(col("est_total") > col("est_n")).count()
    assert(looser === 0L, "min(a)+min(b) must not exceed min(a+b)")
  }

  test("streaming CMS grid (complete mode) equals the batch grid after drain") {
    implicit val sc = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = spark.read.parquet(s"${SparkTest.sf0001}/documents.parquet")
    val texts = docs.select(col("text")).as[String].collect()
    val expected = Curation.cmGrid(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val stream = MemoryStream[String]
    val q = Curation.cmGrid(stream.toDF().select(col("value").as("text")))
      .writeStream.format("memory").queryName("cms_grid")
      .outputMode("complete").start()
    try {
      stream.addData(texts.take(texts.length / 2).toSeq)
      q.processAllAvailable()
      stream.addData(texts.drop(texts.length / 2).toSeq)
      q.processAllAvailable()
      val got = spark.table("cms_grid").collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === expected)
    } finally q.stop()
  }

  test("q151 join-size estimate never undercounts, exact without collisions") {
    val r = Curation.q151(spark, SparkTest.sf0001).collect()(0)
    assert(r.getLong(2) >= 0L, "CMS inner product is one-sided")
    // collision-free fixture: base doc 0 {alpha:2, beta:1}, incr doc 7
    // {alpha:1, beta:2} -> exact join size 2*1 + 1*2 = 4
    val d = java.nio.file.Files.createTempDirectory("cmsjoin").toString
    import spark.implicits._
    Seq((0L, "alpha alpha beta", "en", "s", 16L),
        (7L, "alpha beta beta", "en", "s", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val g = Curation.q151(spark, d, w = 4096).collect()(0)
    assert((g.getLong(0), g.getLong(1), g.getLong(2)) === ((4L, 4L, 0L)))
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
