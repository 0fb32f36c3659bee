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

  test("graph tier: restart (q249, reloaded parquet) equals continuous " +
      "(q218, process pins)") {
    val continuous = GraphRank.q218(spark, dir)
    val restart = GraphRank.q249(spark, dir)
    try assertRoundTrip(continuous, restart, "LPA ingest output")
    finally { B.freeIfDirectCheckpoint(continuous)
      B.freeIfDirectCheckpoint(restart) }
  }

  /** Driver replay of q250's two-stage CHAIN-ORDERED admission: batch A
    * fills room against the old base's capped baskets, batch B against
    * the merged baskets; ledger = batch-B-touched pairs over the final
    * admitted set. */
  private def chainReplay(cap: Int): Map[(Long, Long), (Long, Long)] = {
    val raw = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "o_custkey", "l_partkey").collect()
      .map(r => (r.getLong(0) % 10, r.getLong(1), r.getLong(2)))
    def slice(f: Long => Boolean): Set[(Long, Long)] =
      raw.filter(t => f(t._1)).map(t => (t._2, t._3)).toSet
    def admit(standing: Set[(Long, Long)], batch: Set[(Long, Long)])
        : Set[(Long, Long)] = {
      val szOf = standing.groupBy(_._1).map { case (c, es) => c -> es.size }
      (batch -- standing).groupBy(_._1).toSeq.flatMap { case (c, es) =>
        es.map(_._2).toSeq.sorted
          .take(math.max(0, cap - szOf.getOrElse(c, 0)))
          .map(p => (c, p)) }.toSet
    }
    val cb = slice(_ < 5).groupBy(_._1).toSeq.flatMap { case (c, es) =>
      es.map(_._2).toSeq.sorted.take(cap).map(p => (c, p)) }.toSet
    val s1 = cb ++ admit(cb, slice(m => m >= 5 && m < 7))
    val nB = admit(s1, slice(_ >= 7))
    val adm = s1 ++ nB
    val want = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    adm.groupBy(_._1).foreach { case (c, basket) =>
      val ps = basket.map(_._2).toSeq.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) {
        val touched = nB((c, ps(i))) || nB((c, ps(j)))
        val k = (ps(i), ps(j))
        val (d0, f0) = want.getOrElse(k, (0L, 0L))
        want(k) = (d0 + (if (touched) 1L else 0L), f0 + 1L)
      }
    }
    want.filter(_._2._1 > 0).toMap
  }

  private def ledgerOf(df: DataFrame): Map[(Long, Long), (Long, Long)] = {
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    B.freeIfDirectCheckpoint(df)
    got
  }

  test("CF chain (q250): two committed versions on disk; the chained " +
      "ledger equals q244 under a slack cap and the chain-ordered " +
      "replay under a binding cap") {
    // slack cap: the three-slice chain collapses to q244's two-slice
    // split (s1 == the full %10<7 edge set), so the ledgers must agree
    val slackChain = ledgerOf(Recommend.q250(spark, dir))
    val q244Ledger = ledgerOf(Recommend.q244(spark, dir))
    assert(slackChain == q244Ledger,
      "slack-cap chain diverges from the single-ingest split")
    // both chain versions committed on disk
    val vs = DurableState.committedVersions(
      DurableState.rootFor(dir), "cfchain256")
    assert(vs.size >= 2, s"chain left ${vs.size} committed versions")
    // binding cap: chain-ordered admission, replayed driver-side
    val cap = 16
    val got = ledgerOf(Recommend.q250(spark, dir, cap))
    val want = chainReplay(cap)
    assert(got.nonEmpty, "binding chain admitted nothing — vacuous")
    assert(got.keySet == want.keySet)
    want.foreach { case (k, w) =>
      assert(got(k) == w, s"pair $k: ${got(k)} vs $w") }
    // and the chain ORDER matters at this cap: stage-A edges occupied
    // room that q244's one-shot admission would have granted to B —
    // assert the two ledgers differ, so the test cannot silently pass
    // on order-free semantics
    val oneShot = ledgerOf(Recommend.q244(spark, dir, cap))
    assert(got != oneShot,
      "binding chain indistinguishable from one-shot admission")
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
