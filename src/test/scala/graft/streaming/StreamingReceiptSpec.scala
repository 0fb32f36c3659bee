package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q188's streaming twin: shard receipts maintained per micro-batch by
  * the stateful fold must, once the corpus has drained, equal the
  * monolithic batch recompute bit-for-bit — and a shard's receipt is
  * re-emitted only in batches that touched it (update-mode economy). */
class StreamingReceiptSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("receiptStream drains to the monolithic q188Full receipts bit-for-bit") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val docs = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id").cast("long"),
        size(graft.text.TextAnalysis.toks(col("text")))
          .cast("long").as("n_tok"))
      .as[(Long, Long)].collect()
    assert(docs.length > 100)

    val stream = MemoryStream[(Long, Long)]
    val q = EventStreams.receiptStream(
        stream.toDF().toDF("doc_id", "n_tok"))
      .writeStream.format("memory").queryName("receipts")
      .outputMode("update").start()
    try {
      docs.grouped(docs.length / 4 + 1).foreach { b =>
        stream.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      // memory sink appends update rows in emission order: the LAST
      // row per shard is its final receipt
      val emitted = spark.table("receipts").collect()
        .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      val finalReceipts = emitted.zipWithIndex
        .groupBy(_._1._1).map { case (s, rs) => s -> rs.maxBy(_._2)._1._2 }
      val full = graft.queries.Layout.q188Full(spark, dir).collect()
        .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(full.nonEmpty && finalReceipts == full,
        s"drained receipts diverge from monolithic recompute")
      // update-mode economy: no shard emits more rows than there were
      // micro-batches, and at least one shard skipped a batch OR all
      // were touched every batch (both fine) — but emissions are
      // bounded, never per-document
      val counts = emitted.groupBy(_._1).map(_._2.length)
      assert(counts.max <= 5, s"a shard emitted ${counts.max} rows — per-doc leak?")
    } finally q.stop()
  }
}
