package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.core.Tables

/** Streaming gated on batch equivalence (SURVEY.md §5.5): the same
  * transform over a MemoryStream of the events table must produce the batch
  * result once the stream is drained. */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  import spark.implicits._

  test("streaming hourly window equals batch result after drain") {
    val batchEvents = EventStreams.typedEvents(spark, SparkTest.sf0001)
    val expected = EventStreams.hourlyByType(batchEvents.toDF())
      .orderBy(col("w"), col("event_type")).collect().toSeq

    implicit val sc = spark.sqlContext
    val stream = MemoryStream[EventStreams.Event]
    val rows = batchEvents.collect()
    val q = EventStreams.hourlyByType(stream.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try {
      // two batches to exercise incremental state
      stream.addData(rows.take(rows.length / 2).toSeq)
      q.processAllAvailable()
      stream.addData(rows.drop(rows.length / 2).toSeq)
      q.processAllAvailable()
      val got = spark.table("hourly")
        .orderBy(col("w"), col("event_type")).collect().toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming sliding window equals batch result after drain") {
    val batchEvents = EventStreams.typedEvents(spark, SparkTest.sf0001)
    val expected = EventStreams.slidingByType(batchEvents.toDF())
      .orderBy(col("w"), col("event_type")).collect().toSeq

    implicit val sc = spark.sqlContext
    val stream = MemoryStream[EventStreams.Event]
    val q = EventStreams.slidingByType(stream.toDF())
      .writeStream.format("memory").queryName("sliding")
      .outputMode("complete").start()
    try {
      stream.addData(batchEvents.collect().toSeq)
      q.processAllAvailable()
      val got = spark.table("sliding")
        .orderBy(col("w"), col("event_type")).collect().toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("stream-static segment enrichment equals batch result after drain") {
    val batchEvents = EventStreams.typedEvents(spark, SparkTest.sf0001)
    val dim = EventStreams.custDim(spark, SparkTest.sf0001)
    val expected = EventStreams.segmentHourly(batchEvents.toDF(), dim)
      .orderBy(col("w"), col("mktsegment")).collect().toSeq

    implicit val sc = spark.sqlContext
    val stream = MemoryStream[EventStreams.Event]
    val rows = batchEvents.collect()
    val q = EventStreams.segmentHourly(stream.toDF(), dim)
      .writeStream.format("memory").queryName("segment_hourly")
      .outputMode("complete").start()
    try {
      // two batches: the static dim must enrich BOTH micro-batches
      stream.addData(rows.take(rows.length / 2).toSeq)
      q.processAllAvailable()
      stream.addData(rows.drop(rows.length / 2).toSeq)
      q.processAllAvailable()
      val got = spark.table("segment_hourly")
        .orderBy(col("w"), col("mktsegment")).collect().toSeq
      assert(got == expected)
    } finally q.stop()
  }

  test("ingest dedup suppresses token-less duplicates (both sides fingerprint in-row)") {
    // the regression this guards: a wordSets-based corpus side has NO row
    // for a token-less document (the exploded aggregate drops it), so its
    // incoming duplicate — fingerprinting md5('') in-row — would be KEPT;
    // with rowFp on both sides they match and the duplicate is dropped
    val dir = java.nio.file.Files.createTempDirectory("ingestzero").toString
    import spark.implicits._
    Seq(
      (0L, "12345 !!!", "en", "srcA", 9L),  // corpus, zero [a-z] tokens
      (1L, "real words here", "en", "srcA", 15L), // corpus
      (7L, "999 ###", "en", "srcA", 7L),    // incoming, zero tokens → dup of 0
      (8L, "novel content", "en", "srcB", 13L))   // incoming, genuinely new
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(dir + "/documents.parquet")
    val incoming = Tables(spark, dir, "documents")
      .where(col("doc_id") % 10 >= 7)
    val kept = EventStreams
      .ingestDedup(incoming, EventStreams.corpusFps(spark, dir))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(8L),
      s"token-less incoming duplicate not suppressed: kept $kept")
  }

  test("streaming ingest dedup against the static corpus equals the batch anti join") {
    val dir = SparkTest.sf0001
    val expected = EventStreams.q97(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    implicit val sc = spark.sqlContext
    val incoming = Tables(spark, dir, "documents")
      .where(col("doc_id") % 10 >= 7)
      .select(col("doc_id"), col("text"), col("source"))
      .as[EventStreams.IncomingDoc].collect()
    val stream = MemoryStream[EventStreams.IncomingDoc]
    val q = EventStreams
      .ingestDedup(stream.toDF(), EventStreams.corpusFps(spark, dir))
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
      .writeStream.format("memory").queryName("ingest_dedup")
      .outputMode("complete").start()
    try {
      // two micro-batches: the broadcast corpus set must filter both
      stream.addData(incoming.take(incoming.length / 2).toSeq)
      q.processAllAvailable()
      stream.addData(incoming.drop(incoming.length / 2).toSeq)
      q.processAllAvailable()
      val got = spark.table("ingest_dedup")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
      assert(got.values.sum < incoming.length,
        "anti join dropped nothing — corpus duplicates not exercised")
    } finally q.stop()
  }

  test("streaming near-dup ingest equals the batch q106 corpus labeling after drain") {
    val dir = SparkTest.sf0001
    // batch oracle: exactly the docs q106 labels neardup_corpus
    val expected = graft.dedup.Dedup.q106(spark, dir).collect()
      .collect { case r if r.getString(1) == "neardup_corpus" => r.getLong(0) }
      .toSet
    assert(expected.nonEmpty, "fixture has no corpus near-dups — vacuous")

    implicit val sc = spark.sqlContext
    val incoming = Tables(spark, dir, "documents")
      .where(col("doc_id") % 10 >= 7)
      .select(col("doc_id"), col("text"), col("source"))
      .as[EventStreams.IncomingDoc].collect()
    val stream = MemoryStream[EventStreams.IncomingDoc]
    // built once, materialized (direct checkpoint) — freed when the
    // ingest session ends, per the corpusNearDupIndex storage contract
    val index = EventStreams.corpusNearDupIndex(spark, dir)
    val q = EventStreams
      .nearDupIngest(stream.toDF(), index)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .writeStream.format("memory").queryName("neardup_ingest")
      .outputMode("complete").start()
    try {
      // two micro-batches: the broadcast corpus index must probe both
      stream.addData(incoming.take(incoming.length / 2).toSeq)
      q.processAllAvailable()
      stream.addData(incoming.drop(incoming.length / 2).toSeq)
      q.processAllAvailable()
      val got = spark.table("neardup_ingest")
        .collect().map(_.getLong(0)).toSet
      assert(got == expected,
        s"missed: ${expected.diff(got).take(5)} extra: ${got.diff(expected).take(5)}")
    } finally {
      q.stop()
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(index)
    }
  }

  test("watermarked delivery dedup: a full re-delivery across batches is dropped (bounded state)") {
    // the production (bounded-state) twin of the unbounded dropDuplicates
    // below: dropDuplicatesWithinWatermark keys on event_id, and the
    // replayed batch must vanish whether a row is caught by key state
    // (ts >= watermark) or by the late filter (ts < watermark)
    val batchEvents = EventStreams.typedEvents(spark, SparkTest.sf0001)
    val rows = batchEvents.collect().toSeq
    val expectedIds = rows.map(_.event_id).toSet

    implicit val sc = spark.sqlContext
    val stream = MemoryStream[EventStreams.Event]
    val q = EventStreams.dedupDelivery(stream.toDF())
      .writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append").start()
    try {
      stream.addData(rows)
      q.processAllAvailable()
      stream.addData(rows) // crash-replay: the whole input re-delivered
      q.processAllAvailable()
      val got = spark.table("wm_dedup").collect().map(_.getLong(0))
      assert(got.length == expectedIds.size,
        s"${got.length} rows survived, want ${expectedIds.size}")
      assert(got.toSet == expectedIds)
    } finally q.stop()
  }

  test("streaming exact dedup: duplicate fingerprints across batches are dropped") {
    // streaming twin of q22/q27: dropDuplicates on a content fingerprint
    // keyed state — a doc re-ingested in a later micro-batch is dropped
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = stream.toDF().toDF("doc_id", "fp")
      .dropDuplicates("fp")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      stream.addData((1L, "a"), (2L, "b"), (3L, "a"))
      q.processAllAvailable()
      stream.addData((4L, "b"), (5L, "c"), (6L, "a"))
      q.processAllAvailable()
      val kept = spark.table("dedup").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(kept.map(_._2) == Set("a", "b", "c"),
        s"wrong fingerprints survived: $kept")
      assert(kept.size == 3, s"duplicates not dropped: $kept")
    } finally q.stop()
  }

  test("append mode drops a row later than the watermark (late-data semantics)") {
    // hourlyByType sets a 2 h watermark on streaming input. In append
    // mode a window is emitted exactly once, when the watermark passes
    // its end; a row arriving with event time older than the watermark
    // must be DROPPED, not merged into a new copy of the window.
    def ev(id: Long, hhmm: String): EventStreams.Event =
      EventStreams.Event(id,
        java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00"), 1L, "click", 1.0)

    implicit val sc = spark.sqlContext
    val stream = MemoryStream[EventStreams.Event]
    val q = EventStreams.hourlyByType(stream.toDF())
      .writeStream.format("memory").queryName("latedrop")
      .outputMode("append").start()
    try {
      // batch 1: three rows in the 10:00 window
      stream.addData(ev(1, "10:05"), ev(2, "10:15"), ev(3, "10:45"))
      q.processAllAvailable()
      // batch 2: advance event time to 14:00 → watermark 12:00 ≥ 11:00,
      // so the 10:00 window finalizes and is appended with n=3
      stream.addData(ev(4, "14:00"))
      q.processAllAvailable()
      val after = spark.table("latedrop")
        .where(col("w") === lit("2026-01-01 10:00:00").cast("timestamp_ntz"))
        .collect()
      assert(after.length == 1 && after(0).getAs[Long]("n") == 3L,
        s"10:00 window not finalized as n=3: ${after.toSeq}")

      // batch 3: a LATE row for the closed 10:00 window (event time well
      // behind the 12:00 watermark) — must be dropped
      stream.addData(ev(5, "10:30"))
      q.processAllAvailable()
      // flush far future so any (wrongly) retained state would emit
      stream.addData(ev(6, "23:00"))
      q.processAllAvailable()
      val rows = spark.table("latedrop")
        .where(col("w") === lit("2026-01-01 10:00:00").cast("timestamp_ntz"))
        .collect()
      assert(rows.length == 1 && rows(0).getAs[Long]("n") == 3L,
        s"late row was not dropped: ${rows.toSeq}")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: bounded-state streaming dedup") {
    // plain dropDuplicates keeps EVERY fingerprint forever — state grows
    // with the corpus; the production form bounds state by event time:
    // duplicates within the watermark window are dropped, and state for
    // fingerprints older than the watermark is reclaimed
    def ev(id: Long, hhmm: String, fp: String): EventStreams.Event =
      EventStreams.Event(id,
        java.sql.Timestamp.valueOf(s"2026-01-01 $hhmm:00"), 1L, fp, 1.0)

    implicit val sc = spark.sqlContext
    val stream = MemoryStream[EventStreams.Event]
    val q = stream.toDF()
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_type") // fp stands in
      .select(col("event_id"))
      .writeStream.format("memory").queryName("wmdedup")
      .outputMode("append").start()
    try {
      stream.addData(ev(1, "10:00", "fpA"), ev(2, "10:10", "fpA"))
      q.processAllAvailable() // id 2 is a dup within the window
      stream.addData(ev(3, "12:00", "fpB"))
      q.processAllAvailable() // watermark 11:30 — fpA state reclaimable
      stream.addData(ev(4, "12:10", "fpA"))
      q.processAllAvailable() // fpA again, far outside the window → kept
      val ids = spark.table("wmdedup").collect().map(_.getLong(0)).toSet
      assert(ids.contains(1L) && !ids.contains(2L),
        s"in-window duplicate not dropped: $ids")
      assert(ids.contains(4L),
        s"fingerprint re-seen after watermark expiry must be kept: $ids")
    } finally q.stop()
  }

  test("file-source stream (landed parquet files) equals the batch transform") {
    // the production file-ingest shape: a writer lands parquet files in a
    // directory, the streaming job discovers them per micro-batch
    // (maxFilesPerTrigger bounds batch size) — no message bus needed
    val dir = SparkTest.sf0001
    val landing = java.nio.file.Files.createTempDirectory("landing").toString
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    // two "landed" file generations
    ev.where(col("event_id") % 2 === 0).write.mode("append").parquet(landing)
    ev.where(col("event_id") % 2 === 1).write.mode("append").parquet(landing)
    val expected = EventStreams.hourlyByType(spark.read.parquet(landing))
      .collect().map(_.toSeq).toSet

    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing)
    val q = EventStreams.hourlyByType(stream)
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("file_hourly").collect().map(_.toSeq).toSet
      assert(got == expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("file-source streaming incremental manifest equals batch q110 after drain") {
    // q110's streaming face: the batch slice lands as id-ordered parquet
    // generations, each becomes a micro-batch (maxFilesPerTrigger=1),
    // and the drained manifest must be ROW-IDENTICAL to the batch q110 —
    // offsets continuing across micro-batches via the running shift, and
    // cross-micro-batch duplicates suppressed by the growing fp store
    val dir = SparkTest.sf0001
    val landing = java.nio.file.Files.createTempDirectory("m_landing").toString
    val fpStore = java.nio.file.Files.createTempDirectory("m_fpstore").toString
    val sink = java.nio.file.Files.createTempDirectory("m_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("m_ckpt").toString

    val batchDocs = Tables(spark, dir, "documents")
      .where(col("doc_id") % 10 >= 7)
      .select(col("doc_id"), col("text"))
    // choose the generation split so a duplicate GROUP straddles it: the
    // keeper lands in gen 1, a QUALITY-PASSING later copy in gen 2 — the
    // cross-micro-batch suppression (fp store) is then load-bearing for
    // the equality, not just the within-batch keeper aggregate
    val fps = batchDocs
      .select(col("doc_id"), EventStreams.rowFp(col("text")).as("fp"),
        col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def passesQuality(id: Long, t: String): Boolean = {
      val alpha = t.toLowerCase.count(c => c >= 'a' && c <= 'z')
      val toks = t.toLowerCase.split("[^a-z]+").count(_.nonEmpty)
      alpha.toDouble / t.length >= 0.7 && toks >= 10 && id % 50 != 0
    }
    val splitId = fps.groupBy(_._2).values
      .filter(_.length >= 2)
      .flatMap { g =>
        val sorted = g.sortBy(_._1)
        sorted.drop(1).find { case (id, _, t) => passesQuality(id, t) }
          .map(_._1)
      }.minOption
    assert(splitId.nonEmpty,
      "fixture has no quality-passing cross-batch duplicate — split test vacuous")
    val gen1 = batchDocs.where(col("doc_id") < splitId.get)
    val gen2 = batchDocs.where(col("doc_id") >= splitId.get)
    assert(gen1.count() > 0 && gen2.count() > 0)
    gen1.coalesce(1).write.mode("append").parquet(landing)
    Thread.sleep(1100) // distinct mtimes: the file source orders by them
    gen2.coalesce(1).write.mode("append").parquet(landing)

    EventStreams.initManifestFpStore(spark, dir, fpStore)
    val stream = spark.readStream
      .schema(batchDocs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing)
    val q = EventStreams.manifestIngest(stream, dir, fpStore, sink, ckpt)
    val nBatches = try {
      q.processAllAvailable()
      q.recentProgress.count(_.numInputRows > 0)
    } finally q.stop()
    assert(nBatches >= 2,
      s"only $nBatches non-empty micro-batches — incremental path not exercised")

    val batch = graft.queries.Curation.q110(spark, dir)
    val expected = batch.collect().map(_.toSeq).toSeq
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(batch)
    val got = EventStreams.BatchStore.read(spark, sink)
      .select(col("doc_id"), col("n_tok"), col("start_tok"),
        col("first_seq"), col("last_seq"), col("n_seqs"))
      .orderBy(col("doc_id"))
      .collect().map(_.toSeq).toSeq
    assert(got == expected,
      s"streaming manifest diverges from batch q110 (${got.size} vs ${expected.size} rows)")
  }

  test("file-source streaming sparse ingest equals batch q124 after drain") {
    // q124's streaming face: the batch slice lands as id-ordered parquet
    // generations; each micro-batch is vectorized under the frozen corpus
    // model, probed against the static corpus postings and the GROWING
    // store of earlier-ingested postings, and the drained labels must be
    // ROW-IDENTICAL to the batch q124. The generation split lands at a
    // neardup_batch doc's id so its earlier match sits in gen 1 — the
    // cross-micro-batch store probe is then load-bearing, not just the
    // within-batch join.
    val dir = SparkTest.sf0001
    val want = graft.queries.Ranking.q124(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nbIds = want.collect { case (id, "neardup_batch") => id }
    assert(nbIds.nonEmpty,
      "fixture has no neardup_batch doc — cross-batch path vacuous")
    val splitId = nbIds.min

    val landing = java.nio.file.Files.createTempDirectory("s_landing").toString
    val store = java.nio.file.Files.createTempDirectory("s_store").toString + "/p"
    val sink = java.nio.file.Files.createTempDirectory("s_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("s_ckpt").toString
    val batchDocs = Tables(spark, dir, "documents")
      .where(col("doc_id") % 10 >= 7)
      .select(col("doc_id"), col("text"))
    val gen1 = batchDocs.where(col("doc_id") < splitId)
    val gen2 = batchDocs.where(col("doc_id") >= splitId)
    assert(gen1.count() > 0 && gen2.count() > 0)
    gen1.coalesce(1).write.mode("append").parquet(landing)
    Thread.sleep(1100) // distinct mtimes: the file source orders by them
    gen2.coalesce(1).write.mode("append").parquet(landing)

    val nCorpus = Tables(spark, dir, "documents")
      .where(col("doc_id") % 10 < 7).count()
    val (dfModel, corpusVecs) = EventStreams.corpusSparseModel(spark, dir)
    val stream = spark.readStream
      .schema(batchDocs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing)
    val q = EventStreams.sparseIngest(stream, dfModel, corpusVecs, nCorpus,
      store, sink, ckpt)
    val nBatches = try {
      q.processAllAvailable()
      q.recentProgress.count(_.numInputRows > 0)
    } finally q.stop()
    org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(dfModel)
    org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(corpusVecs)
    assert(nBatches >= 2,
      s"only $nBatches non-empty micro-batches — incremental path not exercised")
    val got = EventStreams.BatchStore.read(spark, sink).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want,
      s"streaming labels diverge from batch q124 (${got.size} vs ${want.size})")
  }

  test("restart from checkpoint resumes exactly-once (no loss, no duplicates)") {
    // stop a running query, feed more data, restart with the SAME
    // checkpoint: the committed offsets must carry over — every input
    // row appears in the file sink exactly once across both incarnations
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("sink").toString
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    def start() = stream.toDF().toDF("id", "s")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    try {
      stream.addData((1L, "a"), (2L, "b"))
      q1.processAllAvailable()
    } finally q1.stop()

    stream.addData((3L, "c")) // arrives while no query is running
    val q2 = start()
    try {
      stream.addData((4L, "d"))
      q2.processAllAvailable()
    } finally q2.stop()

    val ids = spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L), s"exactly-once violated: $ids")
  }

  test("stream-static enrichment join equals the batch join after drain") {
    // the dim side is a STATIC table (re-read per micro-batch, never
    // stateful) — the standard enrichment shape: stream of events joined
    // to a slowly-changing dimension
    val ev = Tables(spark, SparkTest.sf0001, "events")
    val dim = ev.select(col("user_id")).distinct()
      .withColumn("cohort", pmod(col("user_id"), lit(7)))

    implicit val sc = spark.sqlContext
    val stream = MemoryStream[EventStreams.Event]
    val q = stream.toDF().select(col("event_id"), col("user_id"))
      .join(dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      val rows = EventStreams.typedEvents(spark, SparkTest.sf0001).collect()
      stream.addData(rows.take(rows.length / 2).toSeq)
      q.processAllAvailable()
      stream.addData(rows.drop(rows.length / 2).toSeq)
      q.processAllAvailable()
      // memory sink column order follows the streaming projection
      val got = spark.table("enriched")
        .select(col("user_id"), col("event_id"), col("cohort"))
        .collect().map(_.toSeq).toSet
      val want = ev.select(col("event_id"), col("user_id"))
        .join(dim, Seq("user_id"))
        .select(col("user_id"), col("event_id"), col("cohort"))
        .collect().map(_.toSeq).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch join after drain") {
    val ev = Tables(spark, SparkTest.sf0001, "events")
    val expected = EventStreams.purchaseAttribution(
      EventStreams.clicksOf(ev), EventStreams.purchasesOf(ev))
      .collect().map(_.toSeq).toSet

    implicit val sc = spark.sqlContext
    val clickStream = MemoryStream[EventStreams.Event]
    val buyStream = MemoryStream[EventStreams.Event]
    def shape(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
              s: MemoryStream[EventStreams.Event]) =
      f(s.toDF().select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value")))
    val q = EventStreams.purchaseAttribution(
        shape(EventStreams.clicksOf, clickStream),
        shape(EventStreams.purchasesOf, buyStream))
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      val events = EventStreams.typedEvents(spark, SparkTest.sf0001).collect()
      val (clicks, buys) = (
        events.filter(_.event_type == "click"),
        events.filter(_.event_type == "purchase"))
      // two batches per side to exercise incremental join state
      clickStream.addData(clicks.take(clicks.length / 2).toSeq)
      buyStream.addData(buys.take(buys.length / 2).toSeq)
      q.processAllAvailable()
      clickStream.addData(clicks.drop(clicks.length / 2).toSeq)
      buyStream.addData(buys.drop(buys.length / 2).toSeq)
      q.processAllAvailable()
      val got = spark.table("attrib").collect().map(_.toSeq).toSet
      assert(got == expected,
        s"stream ${got.size} rows vs batch ${expected.size}")
    } finally q.stop()
  }

  test("streaming sessionization equals batch sessionization after final flush") {
    val gap = 30
    val batch = EventStreams.sessionizeBatch(
      Tables(spark, SparkTest.sf0001, "events"), gap)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect().map(_.toSeq).toSet

    implicit val sc = spark.sqlContext
    val stream = MemoryStream[EventStreams.Event]
    val events = EventStreams.typedEvents(spark, SparkTest.sf0001).collect()
    val q = EventStreams.sessionizeStream(stream.toDS(), gap)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      stream.addData(events.toSeq)
      q.processAllAvailable()
      // advance watermark far past the data so all sessions time out
      val last = events.map(_.ts.getTime).max
      stream.addData(EventStreams.Event(-1L, new java.sql.Timestamp(last + 86400000L), -1L, "flush", 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .where(col("user_id") =!= -1L)
        .select(
          col("user_id"),
          col("session_start").cast("timestamp_ntz"),
          col("session_end").cast("timestamp_ntz"),
          col("n_events"))
        .collect().map(_.toSeq).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming admission quota equals the batch per-source cap after drain") {
    val dir = SparkTest.sf0001
    val k = 10
    // batch twin: first k docs per source in id order
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val expected = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .where(col("rk") <= k)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet

    implicit val sc = spark.sqlContext
    val stream = MemoryStream[EventStreams.IncomingDoc]
    // arrival order == id order (the documented premise): feed three
    // id-sorted micro-batches so the per-source counter must carry
    // state ACROSS batches to stop at exactly k
    val rows = docs.as[EventStreams.IncomingDoc].collect().sortBy(_.doc_id)
    val q = EventStreams.admissionQuota(stream.toDS(), k)
      .writeStream.format("memory").queryName("admission")
      .outputMode("append").start()
    try {
      val third = rows.length / 3
      stream.addData(rows.take(third).toSeq)
      q.processAllAvailable()
      stream.addData(rows.slice(third, 2 * third).toSeq)
      q.processAllAvailable()
      stream.addData(rows.drop(2 * third).toSeq)
      q.processAllAvailable()
      val got = spark.table("admission")
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(got == expected)
      // the quota actually bound: every source hit its cap
      val perSource = spark.table("admission")
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perSource.values.forall(_ <= k))
      assert(perSource.values.exists(_ == k.toLong),
        "no source reached the cap — quota not exercised")
    } finally q.stop()
  }

  test("streaming ingest audit equals the batch document checks after drain (planted violation caught)") {
    // a corrupted copy of the docs (one broken n_chars) streamed in two
    // batches must converge to the same ledger the batch checks compute
    val docs = Tables(spark, SparkTest.sf0001, "documents")
      .select(col("doc_id"), col("text"),
        when(col("doc_id") === 3L, col("n_chars") + 7L)
          .otherwise(col("n_chars")).as("n_chars"))
    val expected = EventStreams.auditIngest(docs)
      .orderBy(col("check_name")).collect().toSeq

    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, String, Long)]
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val q = EventStreams.auditIngest(
        stream.toDF().toDF("doc_id", "text", "n_chars"))
      .writeStream.format("memory").queryName("audit_ingest")
      .outputMode("complete").start()
    try {
      stream.addData(rows.take(rows.length / 2))
      q.processAllAvailable()
      stream.addData(rows.drop(rows.length / 2))
      q.processAllAvailable()
      val got = spark.table("audit_ingest")
        .orderBy(col("check_name")).collect().toSeq
      assert(got == expected)
      val lenViol = got.find(_.getString(0) == "doc_len_consistent").get
      assert(lenViol.getLong(2) === 1L, "planted violation must be counted")
    } finally q.stop()
  }
}
