package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTest

/** Constraint-audit (q162) and k-core (q163) invariants. Value-level
  * correctness is oracle-gated; these pin the semantic properties. */
class AuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("q162 ledger is complete, self-consistent, and bounded by population") {
    val rows = Audit.q162(spark, dir).collect()
    assert(rows.length === 13, "one ledger row per declared check")
    rows.foreach { r =>
      val (name, v, total, pass) =
        (r.getString(0), r.getLong(2), r.getLong(3), r.getBoolean(4))
      assert(v >= 0L, s"$name negative violations")
      assert(v <= total, s"$name violations exceed population")
      assert(pass === (v == 0L), s"$name pass flag inconsistent")
    }
    // the synthetic fixture is clean — a nonzero here means either the
    // generator changed or a check is wrong; both deserve a look
    val dirty = rows.filter(_.getLong(2) > 0L).map(_.getString(0))
    assert(dirty.isEmpty, s"unexpected violations: ${dirty.mkString(",")}")
  }

  test("q162 detects planted violations (checks are not vacuously green)") {
    // Corrupt a copy of the fixture: break a doc's n_chars and orphan an
    // order's custkey, re-point the loaders via a temp dir of parquet
    // views, and assert exactly those checks trip.
    val tmp = java.nio.file.Files.createTempDirectory("graft_audit").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("n_chars",
        when(col("doc_id") === 0L, col("n_chars") + 1L)
          .otherwise(col("n_chars")))
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("o_custkey",
        when(col("o_orderkey") === 1L, lit(-999999L))
          .otherwise(col("o_custkey")))
    orders.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "lineitem", "events", "documents", "embeddings")
        if t != "documents") {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/$t.parquet"),
        java.nio.file.Paths.get(s"$tmp/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val rows = Audit.q162(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rows("doc_len_consistent") === 1L)
    assert(rows("ord_custkey_fk") === 1L)
    assert(rows("li_qty_range") === 0L, "untouched checks stay green")
  }

  test("q163 k-core: peel CONVERGES inside the round budget, members have in-core degree >= k") {
    // convergence is asserted, not assumed: one extra round must change
    // nothing (peeling is monotone, so rounds == rounds+1 ⇒ fixpoint —
    // a larger fixture that needed > 10 peels would fail HERE with a
    // clear signal instead of failing the degree property below while
    // engine and oracle still "agree" on the unconverged set)
    val df = GraphRank.q163(spark, dir)
    val core = df.collect()
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(df)
    val dfMore = GraphRank.q163(spark, dir, rounds = 11)
    val coreMore = dfMore.collect()
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(dfMore)
    assert(core.map(_.toSeq).toSet == coreMore.map(_.toSeq).toSet,
      "round 11 changed the core — the 10-round budget did NOT reach " +
        "the fixpoint on this fixture; raise q163's default rounds")
    assert(core.nonEmpty, "2-core must be non-vacuous on the fixture")
    // at the (now proven) fixpoint every member keeps >= 2 neighbors
    // INSIDE the core
    core.foreach(r => assert(r.getInt(1) >= 2,
      s"doc ${r.getLong(0)} in-core degree ${r.getInt(1)} < k"))
  }

  test("q191 PSI ledger: probabilities normalize, terms nonneg, totals = decimal sum") {
    val rows = Audit.q191(spark, dir).collect()
    val (totals, buckets) = rows.partition(_.getString(1) == "__psi_total")
    assert(totals.map(_.getString(0)).sorted.toSeq ===
      Seq("lang", "len_bin", "source"), "one total row per feature")
    buckets.foreach { r =>
      assert(r.getDouble(6) >= 0.0,
        s"${r.getString(0)}/${r.getString(1)}: PSI term negative " +
          s"((p-q)ln(p/q) is always >= 0)")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) < 1.0, "p_ref in (0,1)")
      assert(r.getDouble(5) > 0.0 && r.getDouble(5) < 1.0, "p_cur in (0,1)")
    }
    // Laplace smoothing over the union bucket set normalizes EXACTLY:
    // sum_b (n_b + 0.5) / (tot + 0.5*nb) == 1 per feature per slice
    for (f <- Seq("source", "lang", "len_bin"); c <- Seq(4, 5)) {
      val s = buckets.filter(_.getString(0) == f).map(_.getDouble(c)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$f col$c probabilities sum to $s")
    }
    // the headline index is the (order-independent) decimal sum of the
    // rounded bucket terms — recompute it from the ledger itself
    for (f <- Seq("source", "lang", "len_bin")) {
      val fromBuckets = buckets.filter(_.getString(0) == f)
        .map(r => BigDecimal(r.getDouble(6)).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)).sum
      val total = totals.find(_.getString(0) == f).get.getDouble(6)
      assert(math.abs(fromBuckets.toDouble - total) < 1e-9,
        s"$f total $total != bucket sum $fromBuckets")
    }
  }

  test("q191 detects PLANTED drift (and only on the drifted feature)") {
    // relabel the batch slice's source — the source marginal shifts
    // hard, lang and len_bin stay put; the ledger must say exactly that
    val tmp = java.nio.file.Files.createTempDirectory("graft_psi").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("source",
        when(Audit.q191IsCur, lit("drifted")).otherwise(col("source")))
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def psiTotals(d: String): Map[String, Double] =
      Audit.q191(spark, d).collect()
        .filter(_.getString(1) == "__psi_total")
        .map(r => r.getString(0) -> r.getDouble(6)).toMap
    val base = psiTotals(dir)
    val drifted = psiTotals(tmp)
    assert(drifted("source") > 0.25,
      s"planted 100% source drift must trip the ACT threshold, " +
        s"got ${drifted("source")}")
    assert(drifted("source") > base("source") * 2,
      "drifted source PSI must dominate the baseline's sampling noise")
    assert(math.abs(drifted("lang") - base("lang")) < 1e-9,
      "lang marginal untouched by the source relabel")
    assert(math.abs(drifted("len_bin") - base("len_bin")) < 1e-9,
      "len_bin marginal untouched by the source relabel")
  }

  test("q200 release sign-off: sections complete and cross-bound to their operators") {
    val rows = Audit.q200(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(rows.size === 14, s"ledger must carry all 14 receipts, got ${rows.size}")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count().toDouble
    assert(rows(("corpus", "n_docs")) === n)
    // clean fixture: no duplicate keys, consistent lengths
    assert(rows(("integrity", "doc_id_dupes")) === 0.0)
    assert(rows(("integrity", "len_mismatches")) === 0.0)
    // drift section IS q191's headline rows — same DataFrame, same values
    val psi = Audit.q191(spark, dir).collect()
      .filter(_.getString(1) == "__psi_total")
      .map(r => s"psi_${r.getString(0)}" -> r.getDouble(6)).toMap
    psi.foreach { case (m, v) =>
      assert(rows(("drift", m)) === v, s"$m diverges from q191")
    }
    // split and retention sections conserve their populations
    assert(rows(("split", "train_docs")) + rows(("split", "valid_docs")) === n)
    val ne = spark.read.parquet(s"$dir/events.parquet").count().toDouble
    assert(rows(("retention", "n_live")) + rows(("retention", "n_held")) +
      rows(("retention", "n_expired")) === ne)
    assert(rows(("checksum", "content_sum")) > 0.0)
  }

  test("q228 Pearson matrix: bounds, population, and a driver-side replay") {
    val rows = Audit.q228(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    assert(rows.size === 6, "4 features -> 6 unordered pairs")
    rows.foreach { case ((fx, fy), (nd, r)) =>
      assert(fx < fy, "pair orientation is lexicographic")
      assert(nd === n, s"($fx,$fy) population")
      r.foreach(v => assert(v >= -1.0 && v <= 1.0, s"($fx,$fy) r=$v"))
    }
    // independent replay of one pair (chars vs toks) in exact BigInt
    // sufficient statistics — same closed form, driver-side
    val xs = docs.collect().map { row =>
      val text = row.getAs[String]("text")
      val toks = text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      (BigInt(row.getAs[Long]("n_chars")), BigInt(toks.length))
    }
    val k = BigInt(xs.length)
    val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
    val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val syy = xs.map(p => p._2 * p._2).sum
    val want = (k * sxy - sx * sy).toDouble /
      (math.sqrt((k * sxx - sx * sx).toDouble) *
        math.sqrt((k * syy - sy * sy).toDouble))
    val got = rows(("chars", "toks"))._2.get
    assert(math.abs(got - BigDecimal(want)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12,
      s"chars-toks r: engine $got vs replay $want")
  }

  test("q229 diversity card: information-theoretic bounds hold") {
    val row = Audit.q229(spark, dir).collect().head
    val ns = row.getLong(0); val total = row.getLong(1)
    val top = row.getDouble(2); val hhi = row.getDouble(3)
    val eff = row.getDouble(4); val ent = row.getDouble(5)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(ns === docs.select("source").distinct().count())
    assert(total > 0)
    // HHI ∈ [1/ns, 1]; effective ∈ [1, ns]; entropy ∈ [0, log2 ns];
    // top share ∈ [1/ns, 1] — the standard concentration sandwiches
    val eps = 1e-6
    assert(hhi >= 1.0 / ns - eps && hhi <= 1.0 + eps, s"hhi $hhi")
    assert(eff >= 1.0 - eps && eff <= ns + eps, s"effective $eff")
    assert(ent >= -eps && ent <= math.log(ns.toDouble) / math.log(2.0) + eps,
      s"entropy $ent")
    assert(top >= 1.0 / ns - eps && top <= 1.0 + eps, s"top $top")
    // cross-consistency: eff divides the UNROUNDED hhi, so it can sit
    // within the rounded hhi's reciprocal sensitivity (5e-7 / hhi²)
    assert(math.abs(eff - 1.0 / hhi) <= 5e-7 / (hhi * hhi) + eps)
    assert(top * top <= hhi + eps, "top source alone contributes p² ≤ HHI")
  }
}
