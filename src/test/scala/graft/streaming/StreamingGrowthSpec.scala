package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q217's streaming face: new-user detection at ingest. Under the
  * at-ingest premise (events arrive in event-time order), the drained
  * one-row-per-user emissions grouped by day must equal batch q217's
  * n_new column exactly, and each user must be announced at most once
  * no matter how many batches carry them. */
class StreamingGrowthSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("newUserStream drains to batch q217's n_new curve; one emission per user ever") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val rows = graft.core.Tables(spark, dir, "events")
      .select(col("event_id"), col("ts").cast("timestamp"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventStreams.Event].collect()
      .sortBy(e => (e.ts.getTime, e.event_id)) // the at-ingest premise

    val stream = MemoryStream[EventStreams.Event]
    val q = EventStreams.newUserStream(stream.toDS())
      .writeStream.format("memory").queryName("newusers")
      .outputMode("append").start()
    try {
      rows.grouped(rows.length / 3 + 1).foreach { b =>
        stream.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val emitted = spark.table("newusers").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // exactly one announcement per user, ever — the state contract
      assert(emitted.map(_._1).distinct.length == emitted.length,
        "a user was announced twice across micro-batches")
      val gotByDay = emitted.groupBy(_._2)
        .map { case (d, xs) => d -> xs.length.toLong }
      val batch = graft.queries.TextQueries.q217(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(2))
        .filter(_._2 > 0L).toMap
      assert(gotByDay == batch,
        s"drained n_new diverges from batch q217: $gotByDay vs $batch")
      // cumulative identity carries over: total announcements = users
      val nUsers = rows.map(_.user_id).distinct.length
      assert(emitted.length == nUsers)
    } finally q.stop()
  }
}
