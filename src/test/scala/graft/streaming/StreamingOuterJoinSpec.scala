package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.core.Tables

/** q199's streaming face: the LEFT OUTER stream-stream interval join.
  * The hard semantics under test: an UNMATCHED purchase may only emit
  * (click columns NULL) once the click side's watermark has passed its
  * join window — so the drain needs sentinel rows advancing both
  * watermarks past every real event before the NULL rows appear. After
  * that flush, the per-purchase attribution ledger rebuilt from the
  * drained rows must equal the batch q199 ledger exactly. */
class StreamingOuterJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("left-outer stream-stream interval join drains to the batch attribution ledger") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val expected = EventStreams.q199(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getBoolean(5)))
      .toSet
    assert(expected.nonEmpty)
    assert(expected.exists(!_._4),
      "fixture must contain UNATTRIBUTED purchases or the outer path is vacuous")
    assert(expected.exists(_._4), "and attributed ones")

    val clickStream = MemoryStream[EventStreams.Event]
    val buyStream = MemoryStream[EventStreams.Event]
    def shape(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
              s: MemoryStream[EventStreams.Event]) =
      f(s.toDF().select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")))
    val q = EventStreams.purchaseAttributionOuter(
        shape(EventStreams.clicksOf, clickStream),
        shape(EventStreams.purchasesOf, buyStream))
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").start()
    try {
      val events = EventStreams.typedEvents(spark, dir).collect()
      val (clicks, buys) = (
        events.filter(_.event_type == "click"),
        events.filter(_.event_type == "purchase"))
      clickStream.addData(clicks.take(clicks.length / 2).toSeq)
      buyStream.addData(buys.take(buys.length / 2).toSeq)
      q.processAllAvailable()
      clickStream.addData(clicks.drop(clicks.length / 2).toSeq)
      buyStream.addData(buys.drop(buys.length / 2).toSeq)
      q.processAllAvailable()
      // sentinel rows 4h past the last event on BOTH sides: the global
      // watermark (min of the two) passes every real purchase's window,
      // releasing the NULL-padded unmatched rows
      val far = new Timestamp(events.map(_.ts.getTime).max + 4 * 3600 * 1000L)
      clickStream.addData(Seq(
        EventStreams.Event(-1L, far, -1L, "click", 0.0)))
      buyStream.addData(Seq(
        EventStreams.Event(-2L, far, -1L, "purchase", 0.0)))
      q.processAllAvailable()
      // one more empty pass: state-store eviction of expired outer rows
      // can land in the micro-batch AFTER the watermark advances
      clickStream.addData(Seq.empty[EventStreams.Event])
      q.processAllAvailable()

      val drained = spark.table("attrib_outer").collect()
        .filter(_.getLong(0) != -1L) // drop the sentinel purchase
        .map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))
      val ledger = drained.groupBy(d => (d._1, d._2)).map { case ((u, p), rs) =>
        val hits = rs.flatMap(_._3)
        (u, p, hits.length.toLong, hits.nonEmpty)
      }.toSet
      assert(ledger == expected,
        s"stream-only=${(ledger -- expected).take(3)} " +
          s"batch-only=${(expected -- ledger).take(3)}")
    } finally q.stop()
  }
}
