package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q236's streaming face: the per-user conversion bit maintained as
  * keyed state, emitted as ±1 arm deltas (the CDC form a two-level
  * streaming aggregate must take). Drain-equality contract: folding the
  * drained deltas per arm equals the batch q236 conversion tallies, no
  * matter how microbatches split the event stream — each user's deltas
  * telescope to their final bit. */
class StreamingAbSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("arm-delta drain folds to the batch A/B conversion tallies") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val batch = graft.queries.Stats.q236(spark, dir).collect().head
    val (convA, convB) = (batch.getLong(1), batch.getLong(3))

    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.abConversionStream(input.toDS())
      .writeStream.format("memory").queryName("ab_deltas")
      .outputMode("update").start()
    try {
      // arrival in event-time order, three uneven chunks — the bit must
      // be allowed to flip down and back up across chunk boundaries
      val events = EventStreams.typedEvents(spark, dir).collect()
        .sortBy(e => (e.ts.getTime, e.event_id))
      val chunks = Seq(
        events.take(events.length / 3),
        events.slice(events.length / 3, 2 * events.length / 3),
        events.drop(2 * events.length / 3))
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }

      val deltas = spark.table("ab_deltas").as[EventStreams.ArmDelta]
        .collect()
      // per-user telescoping: alternating signs starting at +1, so the
      // fold per user is 0 or 1 — the bit, not the flip history
      deltas.groupBy(_.user_id).foreach { case (u, ds) =>
        ds.map(_.delta).zipWithIndex.foreach { case (d, i) =>
          assert(d == (if (i % 2 == 0) 1L else -1L),
            s"user $u delta sequence ${ds.map(_.delta).toSeq}")
        }
        assert(ds.map(_.delta).sum == 0L || ds.map(_.delta).sum == 1L)
      }
      val foldA = deltas.filter(_.arm == 0L).map(_.delta).sum
      val foldB = deltas.filter(_.arm == 1L).map(_.delta).sum
      assert((foldA, foldB) == ((convA, convB)),
        s"drained fold ($foldA,$foldB) != batch ($convA,$convB)")
      assert(deltas.nonEmpty, "no conversions — monitor vacuous")
      // chunked arrival genuinely exercised the flip path (some user
      // crossed the 20% line more than once)
      assert(deltas.groupBy(_.user_id).values.exists(_.length > 1),
        "no user flipped twice — chunking did not exercise the CDC path")
    } finally q.stop()
  }
}
