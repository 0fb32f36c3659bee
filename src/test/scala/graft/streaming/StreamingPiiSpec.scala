package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.text.TextAnalysis

/** The q174 streaming twin: the PII ingest gate over a MemoryStream of
  * planted documents must emit EXACTLY the rows the batch scrub flags on
  * the same data — same counts, same redacted lengths — across multiple
  * micro-batches (stateless map-only kernel ⇒ batch boundaries are
  * invisible in the drained output). */
class StreamingPiiSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("piiGate drains equal to batch q174 over the same planted rows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    // the same planted corpus the batch query scans, as local rows
    val planted = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id").cast("long"),
        TextAnalysis.piiPlanted.as("raw"))
      .as[(Long, String)].collect()
    assert(planted.length > 50)

    val stream = MemoryStream[(Long, String)]
    val q = EventStreams.piiGate(stream.toDF().toDF("doc_id", "raw"))
      .writeStream.format("memory").queryName("piigate")
      .outputMode("append").start()
    try {
      val (first, rest) = planted.splitAt(planted.length / 3)
      stream.addData(first.toIndexedSeq)
      q.processAllAvailable()
      stream.addData(rest.toIndexedSeq)
      q.processAllAvailable()

      val drained = spark.table("piigate").collect()
        .map(_.toSeq).toSet
      val batch = TextAnalysis.q174(spark, dir).collect()
        .map(_.toSeq).toSet
      assert(batch.nonEmpty)
      assert(drained == batch,
        s"stream/batch divergence: stream-only=${drained -- batch}, " +
          s"batch-only=${batch -- drained}")
    } finally q.stop()
  }

  test("pseudoGate drains equal to batch q176 over the same planted rows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    // the q176 planted corpus (incl. the two-value strides), as local rows
    val planted = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id").cast("long"),
        TextAnalysis.pseudoPlanted.as("raw"))
      .as[(Long, String)].collect()
    assert(planted.length > 50)

    val stream = MemoryStream[(Long, String)]
    val q = EventStreams.pseudoGate(stream.toDF().toDF("doc_id", "raw"))
      .writeStream.format("memory").queryName("pseudogate")
      .outputMode("append").start()
    try {
      // three micro-batches: cross-batch token consistency must be free
      // (the same planted value lands in different batches)
      val (a, bc) = planted.splitAt(planted.length / 3)
      val (b, c) = bc.splitAt(bc.length / 2)
      Seq(a, b, c).foreach { batch =>
        stream.addData(batch.toIndexedSeq)
        q.processAllAvailable()
      }
      val drained = spark.table("pseudogate").collect()
        .map(_.toSeq).toSet
      val batch = TextAnalysis.q176(spark, dir).collect()
        .map(_.toSeq).toSet
      assert(batch.nonEmpty)
      assert(drained == batch,
        s"stream/batch divergence: stream-only=${drained -- batch}, " +
          s"batch-only=${batch -- drained}")
    } finally q.stop()
  }
}
