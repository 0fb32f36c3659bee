package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.core.Tables

/** The stream face of the erasure tier (q220's store, served by
  * EventStreams.eraseFromFpStore): the standing fingerprint store that
  * manifestIngest probes and grows is HOLDER-KEYED, an erasure request
  * deletes subject rows between ingest sessions, and a later drain must
  * re-admit content that only the forgotten documents had been
  * suppressing — while a control drain over the un-erased store keeps
  * suppressing it. State equality is the q220 bind: the erased store
  * equals initManifestFpStore run on the erased corpus.
  */
class StreamingEraseSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001
  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("erased fp store equals from-scratch init on the erased corpus") {
    val store = tmp("e_fpstore") + "/p"
    EventStreams.initManifestFpStore(spark, dir, store)
    val erased = Tables(spark, dir, "documents")
      .where(col("doc_id") % 10 < 7 &&
        pmod(col("doc_id"), lit(10L)) === 0L)
      .select(col("doc_id"))
    EventStreams.eraseFromFpStore(spark, store, erased)
    val got = EventStreams.BatchStore.read(spark, store).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    val scratch = tmp("e_fpscratch") + "/p"
    // from-scratch init cannot take a corpus predicate, so rebuild the
    // same ledger directly: the erased corpus slice's (src_id, fp) rows
    val want = graft.dedup.Dedup.wordSets(spark, dir)
      .where(col("doc_id") % 10 < 7 &&
        pmod(col("doc_id"), lit(10L)) =!= 0L)
      .select(col("doc_id").cast("long"),
        md5(array_join(col("words"), " ")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want, "erased store != from-scratch ledger on the " +
      s"erased corpus (${got.size} vs ${want.size} rows)")
    assert(got.nonEmpty)
    // the per-dir swaps left no stray generation directory behind
    val stray = java.nio.file.Files.list(java.nio.file.Paths.get(store))
    try {
      import scala.jdk.CollectionConverters._
      assert(!stray.iterator().asScala
        .exists(_.getFileName.toString.endsWith("_erased_gen")),
        "erase left a stray generation dir")
    } finally stray.close()
    val _ = scratch
  }

  test("a drain over the erased store re-admits forgotten content; " +
      "the control drain keeps suppressing it") {
    val batchDocs = Tables(spark, dir, "documents")
      .where(col("doc_id") % 10 >= 7)
      .select(col("doc_id"), col("text"))

    // candidates: quality-passing batch KEEPERS whose fp's corpus holders
    // were ALL erased — the only docs whose manifest fate the erasure can
    // flip (computed with the engine's own pieces, incl. decontamination)
    val fp = graft.dedup.Dedup.wordSets(spark, dir)
      .select(col("doc_id"), md5(array_join(col("words"), " ")).as("fp"))
    val goneFps = fp.where(col("doc_id") % 10 < 7)
      .groupBy(col("fp"))
      .agg(sum(when(pmod(col("doc_id"), lit(10L)) =!= 0L, 1).otherwise(0))
        .as("kept"))
      .where(col("kept") === 0)
      .select(col("fp"))
    val bfp = batchDocs
      .select(col("doc_id"), EventStreams.rowFp(col("text")).as("fp"))
    val keepers = bfp.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val contaminated = graft.text.Decontaminate.q86(spark, dir, 50)
      .where(col("contaminated")).select(col("doc_id"))
    val candidates = batchDocs
      .select(col("doc_id"),
        graft.text.TextAnalysis.toks(col("text")).as("tk"),
        length(regexp_replace(lower(col("text")), "[^a-z]", ""))
          .cast("int").as("alpha"),
        length(col("text")).cast("int").as("len"))
      .where(col("alpha").cast("double") / col("len") >= 0.7 &&
        size(col("tk")) >= 10 && col("doc_id") % 50 =!= 0)
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(bfp.join(goneFps, Seq("fp"), "left_semi").select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    org.apache.spark.sql.graftbridge.Bridge
      .freeIfDirectCheckpoint(contaminated)
    assert(candidates.nonEmpty,
      "no quality-passing keeper duplicates erased-only content — vacuous")

    def drain(erase: Boolean): Set[Long] = {
      val landing = tmp("e_landing")
      val store = tmp("e_store") + "/p"
      val sink = tmp("e_sink")
      val ckpt = tmp("e_ckpt")
      batchDocs.coalesce(1).write.mode("append").parquet(landing)
      EventStreams.initManifestFpStore(spark, dir, store)
      if (erase)
        EventStreams.eraseFromFpStore(spark, store,
          Tables(spark, dir, "documents")
            .where(col("doc_id") % 10 < 7 &&
              pmod(col("doc_id"), lit(10L)) === 0L)
            .select(col("doc_id")))
      val stream = spark.readStream
        .schema(batchDocs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
      val q = EventStreams.manifestIngest(stream, dir, store, sink, ckpt)
      try q.processAllAvailable() finally q.stop()
      EventStreams.BatchStore.read(spark, sink).select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
    }

    val control = drain(erase = false)
    val freed = drain(erase = true)
    assert(candidates.intersect(control).isEmpty,
      "control drain admitted content the standing store should suppress")
    assert(candidates.subsetOf(freed),
      s"erased drain still suppresses ${candidates -- freed}")
    // erasure only ever ADDS to the manifest (nothing else changed)
    assert(control.subsetOf(freed))
  }
}
