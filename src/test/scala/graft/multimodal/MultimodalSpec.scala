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

  test("q85: real PNG codec round-trip — bytes are PNG, decoded sums match the pixel formula") {
    // encode side emits genuine PNG containers
    val png = Multimodal.encodePng(Multimodal.synthImage(7L, 16, 16))
    assert(png.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a), "not a PNG signature")
    // decode recovers the exact pixels (PNG lossless): closed-form check
    val (w, h, rs, gs, bs) = Multimodal.decodePngSums(png)
    def sum(f: (Int, Int) => Long) =
      (for (y <- 0 until 16; x <- 0 until 16) yield f(x, y)).sum
    assert((w, h) == (16, 16))
    assert(rs == sum((x, y) => (7L * 31 + x * 17 + y * 7) % 256))
    assert(gs == sum((x, y) => (7L * 13 + x * 5 + y * 11) % 256))
    assert(bs == sum((x, y) => (7L * 29 + x * 3 + y * 19) % 256))
    // and the declared query agrees for every doc it covers
    val rows = Multimodal.q85(spark, dir, 16, 20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(3) == sum((x, y) => (id * 31 + x * 17 + y * 7) % 256), s"doc $id r_sum")
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
