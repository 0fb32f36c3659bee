package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Takedown-propagation invariants the oracle can't see: both fixture
  * paths (keeper removed / member removed) fire non-vacuously with the
  * EXPECTED re-elections, and the audit ledger balances. Value-level
  * equality is oracle-gated (q179/q180 both carry full DuckDB twins). */
class TakedownSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001
  private def free(df: org.apache.spark.sql.DataFrame): Unit =
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(df)

  test("q179 re-elects keepers on both fixture paths; no taken-down id survives") {
    val df = Takedown.q179(spark, dir)
    val rows = df.collect()
    free(df)
    assert(rows.nonEmpty, "takedown must intersect the planted clusters")
    rows.foreach { r =>
      assert(r.getLong(0) % 60 != 0, s"taken-down doc ${r.getLong(0)} in output")
      assert(r.getLong(2) % 60 != 0,
        s"doc ${r.getLong(0)} re-homed to a REMOVED keeper ${r.getLong(2)}")
    }
    // keeper-removed path: the {0, 50, 82} triangle loses its keeper 0;
    // survivors stay connected (50-82 edge) and re-elect 50
    val m50 = rows.find(_.getLong(0) == 50L)
      .getOrElse(fail("fixture lost the doc-0 triangle"))
    assert(m50.getLong(1) == 0L && m50.getLong(2) == 50L &&
      m50.getBoolean(3) && m50.getBoolean(4),
      s"doc 50 expected re-election 0→50, got $m50")
    val m82 = rows.find(_.getLong(0) == 82L).get
    assert(m82.getLong(2) == 50L && m82.getBoolean(3) && m82.getBoolean(4))
    // member-removed path: the {8, 12, 120, 360} K4 loses 120 AND 360
    // (both ≡ 0 mod 60); survivors {8, 12} keep their edge and keeper 8
    Seq(8L, 12L).foreach { d =>
      val m = rows.find(_.getLong(0) == d)
        .getOrElse(fail(s"fixture lost the K4 survivor $d"))
      assert(m.getLong(1) == 8L && m.getLong(2) == 8L &&
        !m.getBoolean(3) && !m.getBoolean(4),
        s"doc $d should keep keeper 8 unchanged, got $m")
    }
  }

  test("q180 audit ledger balances and is residual-free") {
    val df = Takedown.q180(spark, dir)
    val m = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    free(df)
    assert(m(("documents", "rows_before")) ==
      m(("documents", "rows_removed")) + m(("documents", "rows_after")))
    assert(m(("documents", "rows_removed")) > 0L, "takedown set empty — vacuous")
    // compliance: NOTHING after the takedown references a removed id
    assert(m(("residual", "manifest_takedown_refs")) == 0L)
    assert(m(("residual", "cluster_takedown_refs")) == 0L)
    // the cluster table genuinely shrank (fixture clusters contain T docs)
    assert(m(("clusters", "docs_after")) < m(("clusters", "docs_before")),
      "takedown must bite the cluster table")
    // the repack is contiguous: its last sequence is arithmetic on totals
    assert(m(("manifest", "last_seq_after")) ==
      (m(("manifest", "tot_tok_after")) - 1) / 128)
  }

  test("q181 discovery resolves every requested subject and hits the clusters") {
    val rows = Takedown.q181(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("user12@example.com", "user17@example.com",
        "user2@example.com", "user7@example.com"),
      "exactly the 4 requested subjects, subject-ordered")
    rows.foreach(r => assert(r.getLong(1) > 0L,
      s"${r.getString(0)} found nothing — discovery fixture vacuous"))
    // the mod-13 second plant puts user7's address in doc 0 — the
    // planted triangle's keeper — so content-discovered erasure
    // exercises the cluster-repair path (q182's bite assertion relies
    // on this)
    val u7 = rows.find(_.getString(0) == "user7@example.com").get
    assert(u7.getLong(2) == 0L, s"user7 should first appear in doc 0, got $u7")
    // arithmetic cross-check of one subject: user2 appears exactly in
    // docs ≡ 0 (mod 7) with id ≡ 2 (mod 20), plus docs ≡ 0 (mod 13)
    // with id ≡ 15 (mod 20)
    val ids = graft.core.Tables(spark, dir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id").cast("long"))
      .collect().map(_.getLong(0))
    val expectU2 = ids.count(id =>
      (id % 7 == 0 && id % 20 == 2) || (id % 13 == 0 && (id + 7) % 20 == 2))
    val u2 = rows.find(_.getString(0) == "user2@example.com").get
    assert(u2.getLong(1) == expectU2,
      s"user2 n_docs ${u2.getLong(1)} != arithmetic expectation $expectU2")
  }

  test("q182 subject-takedown ledger balances, bites, and is residual-free") {
    val df = Takedown.q182(spark, dir)
    val m = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    free(df)
    assert(m(("documents", "rows_before")) ==
      m(("documents", "rows_removed")) + m(("documents", "rows_after")))
    assert(m(("documents", "rows_removed")) > 0L,
      "discovered erasure set empty — vacuous")
    // cross-consistency with q181: the distinct doc set is bounded by
    // the per-subject hit counts (overlap can only shrink it)
    val perSubject = Takedown.q181(spark, dir).collect().map(_.getLong(1))
    assert(m(("documents", "rows_removed")) <= perSubject.sum &&
      m(("documents", "rows_removed")) >= perSubject.max,
      "removed-doc count inconsistent with q181's per-subject hits")
    assert(m(("residual", "manifest_takedown_refs")) == 0L)
    assert(m(("residual", "cluster_takedown_refs")) == 0L)
    assert(m(("residual", "surviving_subject_refs")) == 0L)
    // doc 0 (user7's carrier, the triangle keeper) is in the erasure
    // set, so the cluster table must shrink
    assert(m(("clusters", "docs_after")) < m(("clusters", "docs_before")),
      "content-discovered takedown must bite the cluster table")
    assert(m(("manifest", "last_seq_after")) ==
      (m(("manifest", "tot_tok_after")) - 1) / 128)
  }

  test("q186 cascade ledger: every hop balances, bites, and leaves no orphan refs") {
    val df = Takedown.q186(spark, dir)
    val m = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    free(df)
    Seq("customer", "orders", "lineitem").foreach { t =>
      assert(m((t, "rows_before")) ==
        m((t, "rows_removed")) + m((t, "rows_after")), s"$t unbalanced")
      assert(m((t, "rows_removed")) > 0L, s"cascade never reached $t — vacuous")
    }
    // the cascade must FAN OUT: a customer has many orders, an order
    // many lineitems — equality would mean a hop silently went 1:1
    assert(m(("orders", "rows_removed")) > m(("customer", "rows_removed")))
    assert(m(("lineitem", "rows_removed")) > m(("orders", "rows_removed")))
    assert(m(("lineitem", "qty_removed")) >= m(("lineitem", "rows_removed")),
      "every removed lineitem has quantity >= 1")
    assert(m(("residual", "orders_orphaned_refs")) == 0L)
    assert(m(("residual", "lineitem_orphaned_refs")) == 0L)
  }

  test("q181/q182 are partition-count invariant (P=3 vs P=5)") {
    // the P-sweep discipline on the erasure tier's newest shuffle
    // shapes: the mention explode + broadcast semi join, the
    // discovered-set broadcast anti/outer joins, and the component
    // re-runs must not let shuffle layout into either ledger
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      val runs = Seq("3", "5").map { p =>
        spark.conf.set(key, p)
        val d181 = Takedown.q181(spark, dir).collect().map(_.toSeq).toSeq
        val df182 = Takedown.q182(spark, dir)
        val d182 = df182.collect().map(_.toSeq).toSeq
        free(df182)
        (d181, d182)
      }
      assert(runs(0) == runs(1), "erasure ledgers depend on partition count")
      assert(runs(0)._1.nonEmpty && runs(0)._2.nonEmpty)
    } finally spark.conf.set(key, saved)
  }

  test("q243 license contagion matches an exact-jaccard cluster replay") {
    val df = Takedown.q243(spark, dir)
    val got = df.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getString(2), r.getString(3), r.getBoolean(4)))
      .toMap
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(df)
    val docs = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text")))
    assert(got.size === docs.length, "one ledger row per document")
    // driver-side replay: exact trigram-jaccard edges at 0.7 (the q66
    // oracle relation), union-find components, max-rank contagion
    def grams(t: String): Set[String] = {
      val w = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val gs = docs.map(d => d._1 -> grams(d._3)).toMap
    val parent = scala.collection.mutable.Map(docs.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (i <- docs.indices; j <- (i + 1) until docs.length) {
      val (a, b) = (docs(i)._1, docs(j)._1)
      val inter = (gs(a) & gs(b)).size.toDouble
      val union = gs(a).size + gs(b).size - inter
      if (union > 0 && BigDecimal(inter / union)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP) >= 0.7) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    val names = Seq("cc0", "cc-by", "cc-by-nc", "proprietary")
    def rank(src: String) = src.drop(3).toInt % 4
    val byComp = docs.groupBy(d => find(d._1))
    byComp.values.foreach { members =>
      val er = members.map(d => rank(d._2)).max
      members.foreach { case (id, src, _) =>
        val (gSrc, own, eff, esc) = got(id)
        assert(gSrc == src)
        assert(own == names(rank(src)), s"doc $id own license")
        assert(eff == names(er), s"doc $id effective license")
        assert(esc == (rank(src) < er), s"doc $id escalation flag")
      }
    }
    // contagion is non-vacuous and conservative-only (never downgrades)
    assert(got.values.exists(_._4), "no escalations — clusters never span licenses")
    got.values.foreach { case (_, own, eff, _) =>
      assert(names.indexOf(eff) >= names.indexOf(own)) }
  }
}
