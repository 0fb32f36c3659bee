package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q192's streaming twin: the priority sample maintained per micro-batch
  * must, once the corpus has drained, merge to EXACTLY the batch q192
  * sample — priority sampling's mergeability (top-k of a union == top-k
  * of per-part top-ks) made a tested property, not a cited one. */
class StreamingSampleSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("prioritySampleStream drains to the batch q192 sample bit-for-bit") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val docs = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id").cast("long"), col("source"),
        col("n_chars").cast("long"))
      .as[(Long, String, Long)].collect()
    assert(docs.length > 300, "fixture must exceed k for a non-trivial drain")

    val stream = MemoryStream[(Long, String, Long)]
    val q = EventStreams.prioritySampleStream(
        stream.toDF().toDF("doc_id", "source", "n_chars"), k = 300)
      .writeStream.format("memory").queryName("sample")
      .outputMode("update").start()
    try {
      docs.grouped(docs.length / 4 + 1).foreach { b =>
        stream.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      // drain: per subgroup keep only the LATEST version's rows, then
      // merge to the global top-300 (priority desc, doc_id asc)
      val emitted = spark.table("sample").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3),
          r.getLong(4), r.getDouble(5)))
      val latest = emitted.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        val maxVer = rs.map(_._2).max
        rs.filter(_._2 == maxVer).toSeq
      }
      val mergedTop = latest
        .sortBy { case (_, _, id, _, _, p) => (-p, id) }.take(300)
        .map { case (_, _, id, src, nc, p) =>
          (id, src, nc, BigDecimal(p).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble) }
      val batch = graft.queries.Curation.q192(spark, dir, k = 300).collect()
        .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
        .toSeq
      assert(mergedTop == batch,
        "drained streaming sample diverges from batch q192")
      // state economy: every emission is bounded by k rows per subgroup
      // per micro-batch — never per-document across the whole stream
      val perSubBatches = emitted.groupBy(e => (e._1, e._2)).map(_._2.length)
      assert(perSubBatches.max <= 300, "an emission exceeded the k bound")
    } finally q.stop()
  }
}
