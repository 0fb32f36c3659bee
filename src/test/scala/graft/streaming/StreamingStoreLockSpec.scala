package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.core.Tables

/** The append-mode standing stores' SINGLE-WRITER contract, enforced by
  * EventStreams.StoreWriterLock (VERDICT r12 #5): the parquet-append fp
  * store predates DurableState's versioned commits, so two concurrent
  * writers would interleave rows with no publish protocol — the lock
  * makes the second writer fail FAST instead. OS advisory lock, so a
  * dead holder releases implicitly; here we prove acquire/busy/release
  * and that both ingest queries and the erase-rewrite respect it. */
class StreamingStoreLockSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"storelock_$tag").toString

  private def awaitRelease(store: String, what: String): Unit = {
    // query-termination listeners fire asynchronously after stop()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var ok = false
    while (!ok && System.nanoTime() < deadline) {
      try {
        val l = EventStreams.StoreWriterLock.acquire(store)
        l.close(); ok = true
      } catch { case _: IllegalStateException => Thread.sleep(50) }
    }
    assert(ok, s"$what: lock never released after query termination")
  }

  test("the lock itself: exclusive within a process, released on close") {
    val store = tmp("raw") + "/p"
    val l1 = EventStreams.StoreWriterLock.acquire(store)
    val e = intercept[IllegalStateException] {
      EventStreams.StoreWriterLock.acquire(store)
    }
    assert(e.getMessage.contains("live writer"))
    l1.close()
    val l2 = EventStreams.StoreWriterLock.acquire(store) // now free
    l2.close()
  }

  test("a second manifestIngest on a live store fails fast; the erase-" +
      "rewrite is blocked while the ingest runs; the lock releases on " +
      "query termination") {
    val landing = tmp("landing")
    val store = tmp("store") + "/p"
    val batchDocs = Tables(spark, dir, "documents")
      .where(col("doc_id") % 10 >= 7)
      .select(col("doc_id"), col("text"))
    batchDocs.coalesce(1).write.mode("append").parquet(landing)
    EventStreams.initManifestFpStore(spark, dir, store)

    def stream() = spark.readStream
      .schema(batchDocs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing)

    val q = EventStreams.manifestIngest(stream(), dir, store,
      tmp("sink1"), tmp("ck1"))
    try {
      q.processAllAvailable()
      // a concurrent ingest on the SAME store must not start
      intercept[IllegalStateException] {
        EventStreams.manifestIngest(stream(), dir, store,
          tmp("sink2"), tmp("ck2"))
      }
      // and the erase-rewrite must not tear the store under the writer
      intercept[IllegalStateException] {
        EventStreams.eraseFromFpStore(spark, store,
          spark.range(1).select(col("id").as("doc_id")))
      }
    } finally q.stop()
    awaitRelease(store, "manifestIngest")
    // once released, the erase-rewrite proceeds normally
    EventStreams.eraseFromFpStore(spark, store,
      spark.range(0).select(col("id").as("doc_id")))
    assert(EventStreams.BatchStore.read(spark, store).count() > 0)
  }

  test("sparseIngest holds its posting store's lock for the query " +
      "lifetime and releases on termination") {
    val landing = tmp("s_landing")
    val store = tmp("s_store") + "/p"
    val batchDocs = Tables(spark, dir, "documents")
      .where(col("doc_id") % 10 >= 7)
      .select(col("doc_id"), col("text"))
    batchDocs.coalesce(1).write.mode("append").parquet(landing)
    val (dfModel, corpusVecs) = EventStreams.corpusSparseModel(spark, dir)
    val nCorpus = Tables(spark, dir, "documents")
      .where(col("doc_id") % 10 < 7).count()
    val stream = spark.readStream
      .schema(batchDocs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing)
    val q = EventStreams.sparseIngest(stream, dfModel, corpusVecs, nCorpus,
      store, tmp("s_sink"), tmp("s_ck"))
    try {
      q.processAllAvailable()
      intercept[IllegalStateException] {
        EventStreams.StoreWriterLock.acquire(store)
      }
    } finally q.stop()
    awaitRelease(store, "sparseIngest")
    org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(dfModel)
    org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(corpusVecs)
  }
}
