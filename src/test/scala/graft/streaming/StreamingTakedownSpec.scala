package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.streaming.EventStreams.CorpusEvent

/** The takedown tier's streaming twin: [[EventStreams.tombstoneGate]]
  * must (a) suppress a document arriving after — or in the same
  * micro-batch as — its tombstone, (b) keep suppressing RE-UPLOADS of a
  * tombstoned id for the life of the stream (the stateful part a
  * stream-static anti join can't do), (c) not retract documents admitted
  * before their tombstone (append-mode forward-gate contract; the batch
  * q179/q180 tier owns retroactive repair), and (d) drain equal to the
  * declarative batch twin over the same batch-stamped events. */
class StreamingTakedownSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  private def doc(id: Long) = CorpusEvent(id, tombstone = false, s"text-$id")
  private def tomb(id: Long) = CorpusEvent(id, tombstone = true, "")

  test("tombstoneGate: all four admission paths behave as contracted") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val stream = MemoryStream[CorpusEvent]
    val q = EventStreams.tombstoneGate(stream.toDS())
      .writeStream.format("memory").queryName("tombgate")
      .outputMode("append").start()
    try {
      // b1: doc 1 clean; tombstone for 2 lands before its doc ever arrives
      stream.addData(doc(1), tomb(2))
      q.processAllAvailable()
      // b2: doc 2 = post-tombstone upload (suppressed from state);
      //     doc 3 + its tombstone in ONE batch (tombstone wins in-batch);
      //     doc 4 clean
      stream.addData(doc(2), doc(3), tomb(3), doc(4))
      q.processAllAvailable()
      // b3: tombstone 4 AFTER doc 4 was admitted (no retraction);
      //     doc 5 clean; doc 2 re-upload still suppressed
      stream.addData(tomb(4), doc(5), doc(2))
      q.processAllAvailable()
      // b4: doc 4 re-upload now suppressed (tombstoned in b3)
      stream.addData(doc(4))
      q.processAllAvailable()

      val admitted = spark.table("tombgate").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(admitted == Seq(1L, 4L, 5L),
        s"expected admissions {1,4,5}, got $admitted")
    } finally q.stop()
  }

  test("tombstoneGate drains equal to the batch twin on a corpus-shaped stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext

    // realistic mix: sf0.001 documents arriving over 4 micro-batches;
    // the q179 takedown selector (id ≡ 0 mod 60) becomes tombstones
    // planted in batch (id/60) % 4 — so relative doc/tombstone order
    // varies per id: some docs precede their tombstone, some follow,
    // some share its batch, and every admitted id is also RE-UPLOADED
    // in the following batch to exercise standing state.
    val ids = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id").cast("long")).as[Long].collect().sorted
    assert(ids.length > 100)
    val batches: Seq[Seq[CorpusEvent]] = (0 until 4).map { b =>
      ids.filter(_ % 4 == b).map(doc).toSeq ++
        ids.filter(id => id % 60 == 0 && (id / 60) % 4 == b).map(tomb).toSeq ++
        ids.filter(id => id % 4 == (b + 3) % 4 && b > 0).map(doc).toSeq
    }

    val stream = MemoryStream[CorpusEvent]
    val q = EventStreams.tombstoneGate(stream.toDS())
      .writeStream.format("memory").queryName("tombgate2")
      .outputMode("append").start()
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      val drained = spark.table("tombgate2").collect()
        .map(r => (r.getLong(0), r.getString(2))).sorted.toSeq

      val stamped = batches.zipWithIndex.flatMap { case (evts, i) =>
        evts.map(e => (e.doc_id, e.tombstone, e.text, i.toLong))
      }.toDF("doc_id", "tombstone", "text", "batch")
      val expect = EventStreams.tombstoneGateBatch(stamped).collect()
        .map(r => (r.getLong(0), r.getString(2))).sorted.toSeq

      assert(expect.nonEmpty && drained == expect,
        s"stream/batch divergence: stream=${drained.size} rows, " +
          s"batch=${expect.size} rows")
      // non-vacuous: some ids were suppressed, some admitted twice
      val admittedIds = drained.map(_._1).toSet
      assert(ids.exists(id => id % 60 == 0 && !admittedIds.contains(id)),
        "no tombstone ever bit — fixture vacuous")
      assert(drained.size > admittedIds.size,
        "no re-upload of an admitted id survived — fixture vacuous")
    } finally q.stop()
  }
}
