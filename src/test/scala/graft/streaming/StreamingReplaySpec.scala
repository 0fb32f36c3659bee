package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.core.Tables

/** CRASH-REPLAY exactly-once for the foreachBatch standing-store
  * operators. foreachBatch is AT-LEAST-ONCE: if the process dies after
  * the batch's side effects but before the checkpoint's commit log
  * records it, the restarted query re-delivers the SAME batch — and a
  * bare `mode("append")` store/sink would double-append (duplicate
  * fingerprints, duplicate manifest rows, double-counted postings).
  * These specs force that exact failure by deleting the last entry of
  * `<ckpt>/commits` after a drain (the engine then replays the batch
  * from its pinned offsets on restart) and prove the batch-dir
  * committed layout ([[EventStreams.BatchStore]]) makes the re-delivery
  * REWRITE its own batch dir instead of appending: store, sink, and the
  * continued manifest offsets all equal an uninterrupted control run.
  * The engine-sink analog lives at EventStreamsSpec ("restart from
  * checkpoint resumes exactly-once"); this is the same discipline for
  * the stores the library writes itself.
  */
class StreamingReplaySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"replay_$tag").toString

  /** Simulate a crash AFTER batch side effects but BEFORE the engine
    * committed the batch: remove the newest entry of the checkpoint's
    * commit log (and its checksum twin). On restart the engine replays
    * that batch from the still-pinned offsets. Returns the batch id. */
  private def forceReplay(ckpt: String): Long = {
    val commits = Paths.get(ckpt, "commits")
    val s = Files.list(commits)
    val last =
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.matches("\\d+")).map(_.toLong).max
      } finally s.close()
    Files.delete(commits.resolve(last.toString))
    Files.deleteIfExists(commits.resolve(s".$last.crc")): Unit
    last
  }

  private def landGens(landing: String, gens: Seq[org.apache.spark.sql.DataFrame])
      : Unit =
    gens.zipWithIndex.foreach { case (g, i) =>
      if (i > 0) Thread.sleep(1100) // distinct mtimes: file-source order
      g.coalesce(1).write.mode("append").parquet(landing)
    }

  test("manifestIngest: a crashed batch's re-delivery rewrites its own " +
      "dirs — store, sink, and continued offsets equal the " +
      "uninterrupted run (no duplicates, shift re-seeded)") {
    val batchDocs = Tables(spark, dir, "documents")
      .where(col("doc_id") % 10 >= 7)
      .select(col("doc_id"), col("text"))
    val ids = batchDocs.select(col("doc_id")).collect()
      .map(_.getLong(0)).sorted
    assert(ids.length >= 3, "fixture too small to slice")
    val (cut1, cut2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    val gens = Seq(
      batchDocs.where(col("doc_id") < cut1),
      batchDocs.where(col("doc_id") >= cut1 && col("doc_id") < cut2),
      batchDocs.where(col("doc_id") >= cut2))

    def stream(landing: String) = spark.readStream
      .schema(batchDocs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing)

    // ---- control: all three generations in one uninterrupted run ----
    val (cLanding, cStore, cSink, cCkpt) =
      (tmp("c_landing"), tmp("c_store") + "/p", tmp("c_sink"), tmp("c_ckpt"))
    landGens(cLanding, gens)
    EventStreams.initManifestFpStore(spark, dir, cStore)
    val cq = EventStreams.manifestIngest(stream(cLanding), dir, cStore,
      cSink, cCkpt)
    try cq.processAllAvailable() finally cq.stop()
    val wantSink = EventStreams.BatchStore.read(spark, cSink)
      .collect().map(_.toSeq).toSet
    val wantStore = EventStreams.BatchStore.read(spark, cStore)
      .collect().map(_.toSeq).toSet

    // ---- crashed run: gens 1+2, then a simulated crash that loses the
    //      engine commit of the LAST batch (its store/sink dirs are
    //      already published), then restart + gen 3 ----
    val (landing, store, sink, ckpt) =
      (tmp("landing"), tmp("store") + "/p", tmp("sink"), tmp("ckpt"))
    landGens(landing, gens.take(2))
    EventStreams.initManifestFpStore(spark, dir, store)
    val q1 = EventStreams.manifestIngest(stream(landing), dir, store,
      sink, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    forceReplay(ckpt)
    Thread.sleep(1100)
    gens(2).coalesce(1).write.mode("append").parquet(landing)
    // fresh manifestIngest call = fresh process face: the shift scalar
    // re-seeds from the committed sink, the replayed batch overwrites
    // its own dirs, gen 3 continues the offset space
    val q2 = EventStreams.manifestIngest(stream(landing), dir, store,
      sink, ckpt)
    val replayedBatches = try {
      q2.processAllAvailable()
      q2.recentProgress.count(_.numInputRows > 0)
    } finally q2.stop()
    // non-vacuity: the restarted query really re-delivered the crashed
    // batch AND processed the new generation (>= 2 non-empty batches) —
    // without the replay this spec would pass on any code
    assert(replayedBatches >= 2,
      s"only $replayedBatches non-empty batches after restart — " +
        "the forced replay did not fire")

    val gotSinkRows = EventStreams.BatchStore.read(spark, sink).collect()
      .map(_.toSeq)
    assert(gotSinkRows.length == gotSinkRows.toSet.size,
      "replay duplicated manifest rows")
    assert(gotSinkRows.toSet == wantSink,
      s"replayed-run manifest diverges from the uninterrupted run " +
        s"(${gotSinkRows.length} vs ${wantSink.size} rows)")
    val gotStoreRows = EventStreams.BatchStore.read(spark, store).collect()
      .map(_.toSeq)
    assert(gotStoreRows.length == gotStoreRows.toSet.size,
      "replay duplicated fp-store rows")
    assert(gotStoreRows.toSet == wantStore,
      "replayed-run fp store diverges from the uninterrupted run")
  }

  test("sparseIngest: a crashed batch's re-delivery rewrites its own " +
      "dirs — labels still equal batch q124, postings not double-counted") {
    val want = graft.queries.Ranking.q124(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nbIds = want.collect { case (id, "neardup_batch") => id }
    assert(nbIds.nonEmpty, "no neardup_batch doc — cross-batch vacuous")
    val splitId = nbIds.min
    val batchDocs = Tables(spark, dir, "documents")
      .where(col("doc_id") % 10 >= 7)
      .select(col("doc_id"), col("text"))
    val gens = Seq(
      batchDocs.where(col("doc_id") < splitId),
      batchDocs.where(col("doc_id") >= splitId))
    val (landing, store, sink, ckpt) =
      (tmp("s_landing"), tmp("s_store") + "/p", tmp("s_sink"), tmp("s_ckpt"))
    landGens(landing, gens)
    val nCorpus = Tables(spark, dir, "documents")
      .where(col("doc_id") % 10 < 7).count()
    val (dfModel, corpusVecs) = EventStreams.corpusSparseModel(spark, dir)
    def stream() = spark.readStream
      .schema(batchDocs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing)
    val q1 = EventStreams.sparseIngest(stream(), dfModel, corpusVecs,
      nCorpus, store, sink, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    val storeBefore = EventStreams.BatchStore.read(spark, store).count()
    forceReplay(ckpt)
    val q2 = EventStreams.sparseIngest(stream(), dfModel, corpusVecs,
      nCorpus, store, sink, ckpt)
    val replayed = try {
      q2.processAllAvailable()
      q2.recentProgress.count(_.numInputRows > 0)
    } finally q2.stop()
    assert(replayed >= 1,
      "restarted query processed nothing — the forced replay did not fire")
    org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(dfModel)
    org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(corpusVecs)

    val rows = EventStreams.BatchStore.read(spark, sink).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == rows.toSet.size, "replay duplicated label rows")
    assert(rows.toMap == want,
      s"replayed-run labels diverge from batch q124 (${rows.length} vs " +
        s"${want.size})")
    assert(EventStreams.BatchStore.read(spark, store).count() == storeBefore,
      "replay double-counted the posting store")
  }
}
