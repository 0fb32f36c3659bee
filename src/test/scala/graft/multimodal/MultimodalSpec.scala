package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("binary payload round-trips: md5(payload) equals md5(text)") {
    val bad = Multimodal.mediaTable(spark, dir)
      .join(graft.core.Tables(spark, dir, "documents"),
        col("media_id") === col("doc_id"))
      .where(md5(col("payload")) =!= md5(col("text")))
      .count()
    assert(bad == 0)
  }

  test("stub features are a normalized histogram (sum ≈ 1) and deterministic") {
    val f1 = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir))
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir))
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1 == f2, "features not deterministic across runs")
    f1.values.foreach { h =>
      assert(math.abs(h.map(_.toDouble).sum - 1.0) < 1e-3)
    }
  }

  test("features computed per partition match the local stub on raw bytes") {
    val docs = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Multimodal.extractFeatures(Multimodal.mediaTable(spark, dir))
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    docs.take(20).foreach { case (id, text) =>
      val expected = Multimodal.decodeStub(text.getBytes("UTF-8")).toSeq
      assert(got(id) == expected, s"doc $id")
    }
  }
}
