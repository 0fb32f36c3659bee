package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q191's streaming twin: the ingest-side drift monitor's drained bucket
  * counts must equal the batch PSI ledger's `n_cur` column row-for-row —
  * the stream face and the batch monitor are provably the same marginals
  * (PSI itself is a pure function of these counts plus the static
  * reference, so count equality IS ledger equality). */
class StreamingDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("driftStream drains to q191's batch-slice bucket counts bit-for-bit") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    // the arriving slice: exactly the rows the batch monitor calls cur
    val curDocs = graft.core.Tables(spark, dir, "documents")
      .where(graft.queries.Audit.q191IsCur)
      .select(col("doc_id").cast("long"), col("source"), col("lang"),
        col("n_chars").cast("long"))
      .as[(Long, String, String, Long)].collect()
    assert(curDocs.length > 50)

    val stream = MemoryStream[(Long, String, String, Long)]
    val q = EventStreams.driftStream(
        stream.toDF().toDF("doc_id", "source", "lang", "n_chars"))
      .writeStream.format("memory").queryName("drift")
      .outputMode("update").start()
    try {
      curDocs.grouped(curDocs.length / 4 + 1).foreach { b =>
        stream.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val emitted = spark.table("drift").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      val drained = emitted.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        val maxVer = rs.map(_._2).max
        rs.filter(_._2 == maxVer).map(e => (e._1, e._3) -> e._4).toSeq
      }.toMap
      val batch = graft.queries.Audit.q191(spark, dir).collect()
        .filter(r => r.getString(1) != "__psi_total" && r.getLong(3) > 0L)
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
      assert(batch.nonEmpty && drained == batch,
        s"drained drift counts diverge from the batch monitor: " +
          s"stream-only=${drained.keySet -- batch.keySet} " +
          s"batch-only=${batch.keySet -- drained.keySet}")
      // state economy: emissions are bounded by the bucket space per
      // feature per micro-batch, never per-document
      val perFeatureBatch = emitted.groupBy(e => (e._1, e._2)).map(_._2.length)
      assert(perFeatureBatch.max <= 30, "an emission exceeded the bucket space")
    } finally q.stop()
  }
}
