package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q234/q235/q236 — the statistical-inference trio: Benford audit,
  * Kaplan–Meier survival, two-proportion A/B. Cross-engine exactness is
  * gated by the DuckDB oracle; these specs prove the STATISTICS behave
  * as the textbook says on this fixture — including the load-bearing
  * negative result that the synthetic order totals FAIL Benford. */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  private def tokenHash(s: String): Long = {
    var p = 0L
    var i = 0
    while (i < s.length) { p = p * 31 + s.charAt(i); i += 1 }
    var x = p
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^= (x >>> 31)
    x
  }

  test("q234 Benford audit: ledger conserves the population and detects the synthetic totals") {
    val rows = Stats.q234(spark, dir).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val nOrders = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(rows.map(_._1).toSeq == (1 to 9), "all nine digits observed")
    assert(rows.map(_._2).sum === nOrders, "digit counts conserve orders")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "shares sum to 1")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12,
      "Benford expectations sum to 1")
    rows.foreach(r => assert(r._5 >= 0.0, "chi-square terms nonnegative"))
    // the LOAD-BEARING negative: the driver's synthetic price generator
    // is not log-uniform, so the audit must reject conformance loudly —
    // total chi-square far above the df=8, alpha=0.001 critical 26.12.
    // (If a future fixture WERE Benford, this spec should flip, not the
    // operator.)
    val chi2 = rows.map(_._5).sum
    assert(chi2 > 26.12, s"chi2 $chi2 — synthetic totals looked Benford?")
  }

  test("q235 Kaplan-Meier matches a driver-side replay with censoring") {
    val got = Stats.q235(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // independent replay from raw events
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val firstClick = ev.filter(_._2 == "click").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val obs = firstClick.toSeq.map { case (u, c) =>
      val fp = ev.filter(e => e._1 == u && e._2 == "purchase" && e._3 >= c)
        .map(_._3).sorted.headOption
      fp.map(p => (p - c) / 3600000000L) match {
        case Some(d) if d <= 72 => (d, true)
        case _ => (72L, false)
      }
    }
    val byT = obs.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = obs.size.toLong
    var survival = 1.0
    val want = byT.map { case (t, rs) =>
      val d = rs.count(_._2).toLong
      val c = rs.size - d
      val row = {
        if (d > 0) survival *= (atRisk - d).toDouble / atRisk
        (t, atRisk, d, c.toLong, survival)
      }
      atRisk -= rs.size
      row
    }
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert((g._1, g._2, g._3, g._4) == ((w._1, w._2, w._3, w._4)),
        s"risk-set row at t=${g._1}")
      // engine computes the product in the 8dp-DECIMAL log lane; the
      // naive product replay agrees to well inside the rounding grain
      assert(math.abs(g._5 - w._5) < 1e-5, s"survival at t=${g._1}")
    }
    // monotone, bounded, and the censoring is non-vacuous
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._5 <= a._5 + 1e-12, "survival must be non-increasing")
        assert(b._2 < a._2, "risk set must shrink")
      case _ =>
    }
    assert(got.forall(r => r._5 >= 0.0 && r._5 <= 1.0))
    assert(got.map(_._4).sum > 0, "no censored users — horizon vacuous")
    assert(got.map(_._3).sum > 0, "no events — curve vacuous")
  }

  test("q236 A/B on a null split: arm coin replays, z is honest, gate stays closed") {
    val row = Stats.q236(spark, dir).collect().head
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val users = ev.groupBy(_._1).toSeq.map { case (u, es) =>
      val conv = 5L * es.count(_._2 == "purchase") > es.length
      (math.floorMod(tokenHash(s"ab|$u"), 2L), conv)
    }
    val (nA, cA) = (users.count(_._1 == 0L).toLong,
      users.count(u => u._1 == 0L && u._2).toLong)
    val (nB, cB) = (users.count(_._1 == 1L).toLong,
      users.count(u => u._1 == 1L && u._2).toLong)
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3)) == ((nA, cA, nB, cB)), "arm tallies replay")
    assert(nA > 0 && nB > 0, "hash split left an arm empty")
    val pp = (cA + cB).toDouble / (nA + nB)
    val se = math.sqrt(pp * (1.0 - pp) * (1.0 / nA + 1.0 / nB))
    val z = (cA.toDouble / nA - cB.toDouble / nB) / se
    assert(math.abs(row.getDouble(6) - z) < 1e-6, "z replay")
    // a hash split of one population has zero true lift: the
    // significance gate must stay closed (and |z| small)
    assert(!row.getBoolean(7), "null A/B split flagged significant")
    assert(math.abs(row.getDouble(6)) < 1.96)
  }

  test("q237 CUPED: sufficient-statistics replay and the variance identities") {
    val row = Stats.q237(spark, dir).collect().head
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val t0 = ev.map(_._3).min
    val xy = ev.groupBy(_._1).toSeq.map { case (_, es) =>
      val buys = es.filter(_._2 == "purchase")
      (buys.count(e => (e._3 - t0) / 86400000000L < 14).toLong,
        buys.count(e => (e._3 - t0) / 86400000000L >= 14).toLong)
    }
    val n = xy.size.toLong
    def mean(s: Seq[Long]) = s.sum.toDouble / n
    val (mx, my) = (mean(xy.map(_._1)), mean(xy.map(_._2)))
    val cov = xy.map(p => (p._1 - mx) * (p._2 - my)).sum / n
    val varx = xy.map(p => (p._1 - mx) * (p._1 - mx)).sum / n
    val vary = xy.map(p => (p._2 - my) * (p._2 - my)).sum / n
    assert(row.getLong(0) === n)
    // the engine computes the same moments via exact integer sufficient
    // statistics; the naive centered replay agrees inside rounding grain
    assert(math.abs(row.getDouble(1) - cov / varx) < 1e-6, "theta")
    assert(math.abs(row.getDouble(2) - vary) < 1e-6, "var_y")
    assert(math.abs(row.getDouble(3) - (vary - cov * cov / varx)) < 1e-6,
      "var_adj")
    // identities: 0 <= reduction = rho^2 <= 1, var_adj = (1-rho^2)var_y,
    // and the pre-period covariate genuinely helps on this fixture
    val red = row.getDouble(4)
    assert(red >= 0.0 && red <= 1.0)
    assert(math.abs(row.getDouble(3) - (1.0 - red) * row.getDouble(2)) < 1e-5)
    assert(red > 0.0, "zero correlation — the covariate is vacuous here")
  }

  test("q238 Mann-Whitney: midrank replay against a literal sort-and-rank") {
    val row = Stats.q238(spark, dir).collect().head
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val users = ev.groupBy(_._1).toSeq.map { case (u, es) =>
      (math.floorMod(tokenHash(s"ab|$u"), 2L),
        es.count(_._2 == "purchase").toLong)
    }
    // literal textbook computation: sort ALL metrics, assign midranks
    val sorted = users.map(_._2).sorted
    val midrank = sorted.zipWithIndex.groupBy(_._1).map { case (v, xs) =>
      v -> xs.map(_._2 + 1).sum.toDouble / xs.size
    }
    val a = users.filter(_._1 == 0L); val b = users.filter(_._1 == 1L)
    val ra = a.map(u => midrank(u._2)).sum
    val uA = ra - a.size.toDouble * (a.size + 1.0) / 2.0
    val n = users.size.toDouble
    val ties = users.groupBy(_._2).values
      .map(g => g.size.toDouble).map(t => t * t * t - t).sum
    val sigma2 = a.size.toDouble * b.size / 12.0 *
      ((n + 1.0) - ties / (n * (n - 1.0)))
    val z = (uA - a.size.toDouble * b.size / 2.0) / math.sqrt(sigma2)
    assert(row.getLong(0) === a.size.toLong)
    assert(row.getLong(1) === b.size.toLong)
    assert(math.abs(row.getDouble(2) - uA) < 1e-9,
      s"U_A engine ${row.getDouble(2)} vs literal $uA")
    assert(math.abs(row.getDouble(3) - z) < 1e-6, "z replay")
    // null split: the nonparametric gate stays closed too
    assert(!row.getBoolean(4), "null split flagged significant")
    // U is within its own support and ties were genuinely exercised
    assert(uA >= 0.0 && uA <= a.size.toDouble * b.size)
    assert(ties > 0.0, "no tied metrics — midrank path vacuous")
  }

  test("q242 seasonal decomposition: grid replay and the zero-sum identity") {
    val rows = Stats.q242(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("unix_micros(CAST(ts AS TIMESTAMP)) AS us").collect()
      .map(_.getLong(0))
    val cells = ev.groupBy(us =>
      (us / 86400000000L, (us / 3600000000L) % 24))
      .map { case (k, v) => k -> v.size.toLong }
    val (d0, d1) = (ev.map(_ / 86400000000L).min, ev.map(_ / 86400000000L).max)
    // grid completeness + population conservation
    assert(rows.length.toLong === (d1 - d0 + 1) * 24)
    assert(rows.map(_._3).sum === ev.length.toLong)
    // full driver-side replay of the two-way model
    val grid = (d0 to d1).flatMap(day => (0L to 23L).map(h =>
      (day, h, cells.getOrElse((day, h), 0L))))
    val hm = grid.groupBy(_._2).map { case (h, g) =>
      h -> g.map(_._3).sum.toDouble / g.size }
    val wmm = grid.groupBy(c => (c._1 + 4) % 7).map { case (w, g) =>
      w -> g.map(_._3).sum.toDouble / g.size }
    val gm = grid.map(_._3).sum.toDouble / grid.size
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (day, h, n, exp, res) =>
      assert(n === cells.getOrElse((day, h), 0L), s"cell ($day,$h)")
      val want = hm(h) + wmm((day + 4) % 7) - gm
      assert(math.abs(exp - r6(want)) < 1e-9, s"expected ($day,$h)")
      assert(math.abs(res - r6(n - want)) < 1e-9, s"residual ($day,$h)")
    }
    // the additive decomposition removes everything it models: residuals
    // sum to (rounding-grain) zero over the full grid
    assert(math.abs(rows.map(_._5).sum) < 1e-2)
    // non-vacuous: real seasonality exists (some |residual| is large
    // relative to a flat model's)
    assert(rows.map(r => math.abs(r._5)).max > 1.0)
  }

  test("q245/q246 distribution drift: CDF replay, W1/KS identities, null gate") {
    val w1row = Stats.q245(spark, dir).collect().head
    val ksrow = Stats.q246(spark, dir).collect().head
    // driver-side replay of the split and both statistics
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id",
        "size(filter(split(lower(text), '[^a-z]+'), x -> x != '')) AS v")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong))
    def isCur(id: Long): Boolean = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 10 >= 7
    }
    val ref = docs.filter(d => !isCur(d._1)).map(_._2).sorted
    val cur = docs.filter(d => isCur(d._1)).map(_._2).sorted
    assert(w1row.getLong(0) === ref.length.toLong)
    assert(w1row.getLong(1) === cur.length.toLong)
    assert(ref.length + cur.length === docs.length)
    val values = (ref ++ cur).distinct.sorted
    def cdf(s: Array[Long], v: Long) = s.count(_ <= v).toDouble / s.length
    val diffs = values.map(v => math.abs(cdf(ref, v) - cdf(cur, v)))
    val w1 = values.zip(diffs).sliding(2).collect {
      case Array((v1, d1), (v2, _)) => d1 * (v2 - v1)
    }.sum
    assert(math.abs(w1row.getDouble(2) - w1) < 1e-4,
      s"W1 engine ${w1row.getDouble(2)} vs replay $w1")
    val dStat = diffs.max
    assert(math.abs(ksrow.getDouble(2) - dStat) < 1e-6, "KS D replay")
    assert(dStat >= 0.0 && dStat <= 1.0)
    // a hash split of one population: the KS gate must stay closed
    assert(!ksrow.getBoolean(4), "null split flagged significant")
    assert(ksrow.getDouble(2) < ksrow.getDouble(3))
    // W1 <= D * value-range (the CDF gap integrated over the support)
    assert(w1 <= dStat * (values.max - values.min) + 1e-9)
  }
}
