package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.core.DurableState
import graft.dedup.Dedup

/** The DURABLE face of the standing-state tier (VERDICT r11 #2): every
  * StandingState kind spills to [[DurableState]]'s versioned parquet
  * layout, reloads as a lineage-free scan, and the reloaded state is
  * indistinguishable from the continuous run — q160's `ingest == rebuild`
  * discipline, third face: `restart == continuous`. Plus the commit
  * protocol itself: a dead writer's uncommitted orphan is invisible to
  * readers (the reference's recovery-by-reassignment, coordinator.go:87-107,
  * lifted from tasks to state) and retention prunes old versions.
  */
class DurableStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001
  private val B = org.apache.spark.sql.graftbridge.Bridge

  private def freshRoot(tag: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"),
      s"graft-durable-spec-$tag-${System.nanoTime()}")
    p.toString
  }

  private def rowSet(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(rowKey).toSet

  private def rowKey(r: Row): Seq[Any] =
    r.toSeq.map {
      case a: scala.collection.Seq[_] => a.toVector
      case x => x
    }

  /** Round-trip: spill → reload → row-multiset equality with the source
    * (sizes first so a dup/loss cannot cancel in the set compare). */
  private def assertRoundTrip(src: DataFrame, reloaded: DataFrame,
      what: String): Unit = {
    assert(reloaded.count() == src.count(), s"$what: row count drifted")
    assert(rowSet(reloaded) == rowSet(src), s"$what: content drifted")
  }

  // ---- the commit protocol itself ----

  test("a dead writer's uncommitted orphan version is invisible; the " +
      "next spill overwrites it; retention prunes old versions") {
    val root = freshRoot("proto")
    val df1 = spark.range(5).select(col("id"), (col("id") * 2).as("v"))
    val v1 = DurableState.persistAll(root, "k", Seq("t" -> df1))
    assert(v1 == 1L)
    // plant the orphan: data present, no _COMMITTED marker (a writer
    // that died mid-spill)
    val orphan = Paths.get(root, "k", "v000002")
    spark.range(99).write.parquet(orphan.resolve("t").toString)
    assert(DurableState.latestVersion(root, "k").contains(1L),
      "reader saw an uncommitted version")
    assertRoundTrip(df1, DurableState.load(spark, root, "k", 1L, "t"),
      "v1 under orphan")
    // the next spill takes the orphan's slot and commits it
    val df2 = spark.range(7).select(col("id"), (col("id") * 3).as("v"))
    val v2 = DurableState.persistAll(root, "k", Seq("t" -> df2))
    assert(v2 == 2L)
    assertRoundTrip(df2, DurableState.load(spark, root, "k", 2L, "t"),
      "recommitted orphan slot")
    // retention: after 5 total commits only the newest 3 survive
    (3 to 5).foreach { i =>
      DurableState.persistAll(root, "k",
        Seq("t" -> spark.range(i).toDF("id")))
    }
    assert(DurableState.committedVersions(root, "k") == Seq(3L, 4L, 5L))
    assert(!Files.exists(Paths.get(root, "k", "v000001")),
      "pruned version dir still on disk")
  }

  test("loadOrBuild warm-starts: first call builds and returns the " +
      "RE-READ frames; second call reloads without rebuilding") {
    val root = freshRoot("warm")
    var builds = 0
    def build(): Seq[(String, DataFrame)] = {
      builds += 1
      Seq("t" -> spark.range(9).select(col("id"), (col("id") + 1).as("v")))
    }
    val (v1, m1) = DurableState.loadOrBuild(spark, root, "k", Seq("t"))(build())
    assert(v1 == 1L && builds == 1)
    assertRoundTrip(
      spark.range(9).select(col("id"), (col("id") + 1).as("v")),
      m1("t"), "first boot")
    // restart: the builder must NOT run again
    val (v2, m2) = DurableState.loadOrBuild(spark, root, "k", Seq("t"))(
      sys.error("rebuilt on restart"))
    assert(v2 == 1L)
    assertRoundTrip(m1("t"), m2("t"), "warm start")
  }

  // ---- tier 1: capped CF basket + co-matrix (q244/q247) ----

  test("CF tier: restart (q247, reloaded parquet) equals continuous " +
      "(q244, process pins), and the spilled frames round-trip") {
    val continuous = Recommend.q244(spark, dir)
    val restart = Recommend.q247(spark, dir)
    try assertRoundTrip(continuous, restart, "CF ledger")
    finally { B.freeIfDirectCheckpoint(continuous)
      B.freeIfDirectCheckpoint(restart) }
    // the spilled standing frames equal the builder's DAGs
    val root = DurableState.rootFor(dir)
    val v = DurableState.latestVersion(root, "cf256").get
    assertRoundTrip(Recommend.cappedBaseEdges(spark, dir, 256),
      DurableState.load(spark, root, "cf256", v, "basket"), "CF basket")
    assertRoundTrip(
      Recommend.coMatrixOf(Recommend.cappedBaseEdges(spark, dir, 256)),
      DurableState.load(spark, root, "cf256", v, "co"), "CF co-matrix")
  }

  // ---- tier 2: the holder-keyed fingerprint store (q220) ----

  test("fp store spills and reloads; reload-then-probe equals the " +
      "continuous probe face") {
    val root = freshRoot("fp")
    val fp = Dedup.wordSets(spark, dir)
      .select(col("doc_id"), md5(array_join(col("words"), " ")).as("fp"))
    val ledger = fp.where(col("doc_id") % 10 < 7)
    val v = DurableState.persistAll(root, "fp", Seq("ledger" -> ledger))
    val reloaded = DurableState.load(spark, root, "fp", v, "ledger")
    assertRoundTrip(ledger, reloaded, "fp ledger")
    // the ingest probe face (distinct fp) from the reloaded state
    assertRoundTrip(ledger.select(col("fp")).distinct(),
      reloaded.select(col("fp")).distinct(), "fp probe face")
  }

  // ---- tier 3: the banded minhash corpus index (q221) ----

  test("banded index spills and reloads losslessly") {
    val root = freshRoot("band")
    val bands = Dedup.bandedSignatures(
        Dedup.minhashSignatures(Dedup.shingleHashes(spark, dir)))
      .where(col("doc_id") % 10 < 7)
    val v = DurableState.persistAll(root, "band", Seq("bands" -> bands))
    assertRoundTrip(bands,
      DurableState.load(spark, root, "band", v, "bands"), "band index")
  }

  // ---- tier 4: gram postings + df + pairs + LPA labels (q218/q223) ----

  test("graph tier spills and reloads; the q218 ingest delta over the " +
      "RELOADED state equals the delta over the process pins") {
    val root = freshRoot("graph")
    val (basePost, dfBase, basePairs) =
      GraphRank.graphStanding(spark, dir, 3, 3)
    val labels = GraphRank.lpaStanding(spark, dir, 5, 3, 3)
    val v = DurableState.persistAll(root, "graph", Seq(
      "postings" -> basePost, "df" -> dfBase, "pairs" -> basePairs,
      "labels" -> labels))
    val rPost = DurableState.load(spark, root, "graph", v, "postings")
    val rDf = DurableState.load(spark, root, "graph", v, "df")
    val rPairs = DurableState.load(spark, root, "graph", v, "pairs")
    val rLabels = DurableState.load(spark, root, "graph", v, "labels")
    assertRoundTrip(basePost, rPost, "postings")
    assertRoundTrip(dfBase, rDf, "gram df")
    assertRoundTrip(basePairs, rPairs, "pairs")
    assertRoundTrip(labels, rLabels, "LPA labels")
    // restart == continuous on the INGEST leg: the q218 delta-pair
    // assembly from reloaded frames must equal the pinned-frame one
    val batchPost = Ranking.gramCountsOf(
        graft.core.Tables(spark, dir, "documents")
          .where(col("doc_id") % 10 >= 7))
      .select(col("doc_id"), col("gram")).localCheckpoint()
    try {
      val contin = GraphRank.deltaFullPairs(basePost, dfBase, basePairs,
        batchPost, 3, 3)
      val restart = GraphRank.deltaFullPairs(rPost, rDf, rPairs,
        batchPost, 3, 3)
      assert(contin.count() > 0, "ingest delta vacuous at maxDf=3")
      assertRoundTrip(contin, restart, "ingest delta")
    } finally B.unpersistLocalCheckpoint(batchPost)
  }

  // ---- tier 5: IVF-PQ model + codebook + encoded standing index ----

  test("IVF-PQ tier spills and reloads; encoding a batch against the " +
      "RELOADED codebook equals encoding against the pinned one") {
    val root = freshRoot("pq")
    val st = graft.similarity.Pq.pqStanding(spark, dir, 8, 16, 3, 10)
    val v = DurableState.persistAll(root, "pq", Seq(
      "model" -> st.model, "codebook" -> st.codebook,
      "codes" -> st.standing))
    val rModel = DurableState.load(spark, root, "pq", v, "model")
    val rCodebook = DurableState.load(spark, root, "pq", v, "codebook")
    val rCodes = DurableState.load(spark, root, "pq", v, "codes")
    assertRoundTrip(st.model, rModel, "kmeans model")
    assertRoundTrip(st.codebook, rCodebook, "codebook")
    assertRoundTrip(st.standing, rCodes, "standing codes")
    // ingest face: the batch encode is a pure function of the codebook,
    // and parquet round-trips doubles bit-exactly — prove it end to end
    val batch = st.corpus
      .where(pmod(col("vec_id"), lit(10L)) >= 7L).limit(20)
    val contin = graft.similarity.Pq.encodeCodes(batch, st.codebook, 8,
      st.sub)
    val restart = graft.similarity.Pq.encodeCodes(batch, rCodebook, 8,
      st.sub)
    assert(contin.count() > 0, "empty encode batch — face vacuous")
    assertRoundTrip(contin, restart, "batch encode")
  }
}
