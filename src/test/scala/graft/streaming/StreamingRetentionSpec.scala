package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q189's streaming twin: the retention gate over a MemoryStream of
  * events must admit exactly the rows the batch classification keeps
  * (live + held), and the q189 ledger must balance against what the
  * gate dropped. */
class StreamingRetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("retentionGate drains equal to the batch keep-set; ledger balances") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val events = graft.core.Tables(spark, dir, "events")
      .select(col("event_id").cast("long"),
        col("ts").cast("timestamp"), col("user_id").cast("long"))
      .as[(Long, Timestamp, Long)].collect()
    assert(events.length > 500)

    val stream = MemoryStream[(Long, Timestamp, Long)]
    val q = EventStreams.retentionGate(
        stream.toDF().toDF("event_id", "ts", "user_id"))
      .writeStream.format("memory").queryName("retgate")
      .outputMode("append").start()
    try {
      events.grouped(events.length / 3 + 1).foreach { b =>
        stream.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val drained = spark.table("retgate").select("event_id")
        .collect().map(_.getLong(0)).toSet
      val batchKeep = EventStreams.retentionClass(
          graft.core.Tables(spark, dir, "events"))
        .where(col("ret_class") =!= "expired")
        .select(col("event_id").cast("long"))
        .collect().map(_.getLong(0)).toSet
      assert(batchKeep.nonEmpty && drained == batchKeep,
        s"gate/batch divergence: gate=${drained.size}, batch=${batchKeep.size}")
      // all three classes non-vacuous, and the q189 ledger balances
      // against the gate: total - admitted = expired
      val ledger = EventStreams.q189(spark, dir).collect()
      val (tot, exp, held, live) = ledger.map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4))
      assert(exp > 0 && held > 0 && live > 0,
        s"a retention class is vacuous: expired=$exp held=$held live=$live")
      assert(tot == exp + held + live)
      assert(tot - drained.size == exp,
        "ledger's expired count != what the gate dropped")
    } finally q.stop()
  }
}
