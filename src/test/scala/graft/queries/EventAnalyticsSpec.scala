package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.core.Tables

/** q98 anomaly hours / q99 cohort retention vs full driver-side
  * recomputation on sf0.001 (1.5 k events — small enough to re-derive the
  * entire answer independently in Scala collections). */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  private def hourlyCounts(): Map[(Long, String), Long] =
    Tables(spark, dir, "events")
      .select(unix_micros(date_trunc("hour", col("ts"))).as("h"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("q98 spike flags equal a driver-side trailing-24 recomputation") {
    val counts = hourlyCounts()
    val want = counts.toSeq
      .groupBy(_._1._2)
      .flatMap { case (tpe, rows) =>
        val series = rows.map { case ((h, _), n) => (h, n) }.sortBy(_._1)
        series.indices.flatMap { i =>
          val trail = series.slice(math.max(0, i - 24), i).map(_._2)
          if (trail.isEmpty) None
          else {
            val ps = trail.sum
            val pc = trail.length.toLong
            val (h, n) = series(i)
            val avg = BigDecimal(ps.toDouble / pc)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            Some((h, tpe) -> ((n, avg, n * pc > ps * 2)))
          }
        }
      }
    val got = TextQueries.q98(spark, dir)
      .select(unix_micros(col("w").cast("timestamp")).as("h"), col("event_type"),
        col("n"), col("avg_prev"), col("spike"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q101 funnel equals a driver-side ordered recomputation") {
    val rows = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1)
    def firstAfter(u: Long, tpe: String, after: Long): Option[Long] =
      byUser(u).filter(e => e._2 == tpe && e._3 > after)
        .map(_._3).sorted.headOption
    val signups = byUser.keys.toSeq.flatMap { u =>
      byUser(u).filter(_._2 == "signup").map(_._3).sorted.headOption.map(u -> _)
    }
    val clicks = signups.flatMap { case (u, t1) =>
      firstAfter(u, "click", t1).map(u -> _) }
    val purchases = clicks.flatMap { case (u, t2) =>
      firstAfter(u, "purchase", t2).map(u -> _) }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextQueries.q101(spark, dir).collect()(0)
    assert(got.getLong(0) == signups.size.toLong)
    assert(got.getLong(1) == clicks.size.toLong)
    assert(got.getLong(2) == purchases.size.toLong)
    assert(got.getDouble(3) == r4(clicks.size.toDouble / signups.size))
    assert(got.getDouble(4) == r4(purchases.size.toDouble / clicks.size))
    assert(purchases.nonEmpty)
  }

  test("q101 rejects out-of-order events (purchase before the qualifying click)") {
    // the sf0.001 corpus happens to complete every funnel, so the strict
    // ts-ordering rejection path needs its own fixture: u1 purchases
    // BEFORE clicking (purchase must not count), u2 converts in order,
    // u3 only signs up
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    import spark.implicits._
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    Seq(
      (1L, ts(0), 1L, "signup", 1.0), (2L, ts(1), 1L, "purchase", 1.0),
      (3L, ts(2), 1L, "click", 1.0),
      (4L, ts(0), 2L, "signup", 1.0), (5L, ts(1), 2L, "click", 1.0),
      (6L, ts(2), 2L, "purchase", 1.0),
      (7L, ts(0), 3L, "signup", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(dir + "/events.parquet")
    val got = TextQueries.q101(spark, dir).collect()(0)
    assert(got.getLong(0) == 3L, "signups")            // u1, u2, u3
    assert(got.getLong(1) == 2L, "clicks after")       // u1 (t3>t1), u2
    assert(got.getLong(2) == 1L, "purchases after")    // only u2 — u1's
    // purchase precedes the qualifying click and must not count
  }

  test("q102 session paths equal a driver-side gap-sessionized recomputation") {
    val rows = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gap = 30L * 60L * 1000000L
    val want = rows.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      // split into sessions at > gap silences
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Long, String)]]) {
        case (acc, e) =>
          acc match {
            case cur :: rest if e._3 - cur.head._3 <= gap =>
              (e :: cur) :: rest // cur.head is the session's LAST event
            case _ => List(e) :: acc
          }
      }
      sessions.map(s => s.reverse.map(_._4).mkString(">"))
    }.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val top = want.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = TextQueries.q102(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == top)
    assert(got.nonEmpty && got.exists(_._1.contains(">")),
      "no multi-event session path — gap logic untested")
  }

  test("q99 retention equals a driver-side cohort recomputation; offset 0 covers each cohort") {
    val rows = Tables(spark, dir, "events")
      .select(col("user_id"),
        unix_micros(date_trunc("hour", col("ts"))).as("h"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val firstByUser = rows.groupBy(_._1).map { case (u, v) => u -> v.map(_._2).min }
    val want = rows
      .map { case (u, h) =>
        val c = firstByUser(u)
        (c, (h - c) / 3600000000L, u)
      }
      .distinct
      .groupBy { case (c, o, _) => (c, o) }
      .map { case (k, v) => k -> v.length.toLong }
    val got = TextQueries.q99(spark, dir)
      .select(unix_micros(col("cohort").cast("timestamp")).as("c"),
        col("offset_h"), col("n_users"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == want)
    // every user appears at offset 0 of their own cohort: per-cohort
    // offset-0 counts must sum to the number of distinct users
    val atZero = got.collect { case ((_, 0L), n) => n }.sum
    assert(atZero == firstByUser.size.toLong)
  }

  test("q206 decayed totals equal a driver-side ldexp replay and sit strictly under the raw totals") {
    val got = TextQueries.q206(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // independent replay: exact 1/2^weeks weights, 6-dp terms summed in
    // BigDecimal (the engine's DECIMAL ledger), 4-dp final
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"),
        graft.streaming.EventStreams.epochMicros(col("ts")).as("us"),
        col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val wm = ev.map(_._2).max
    val weekUs = 7L * 86400L * 1000000L
    val want = ev.groupBy(_._1).map { case (et, es) =>
      val dec = es.map { case (_, us, v) =>
        val wk = math.min((wm - us) / weekUs, 60L).toInt
        BigDecimal(v / (1L << wk).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      et -> (es.length.toLong, dec)
    }
    want.foreach { case (et, (n, dec)) =>
      val (gn, graw, gdec) = got(et)
      assert(gn == n, s"$et count")
      assert(gdec == dec, s"$et decayed: engine $gdec vs replay $dec")
      assert(gdec < graw, s"$et decay must strictly shrink a 30-day corpus")
      assert(gdec > 0.0, s"$et decayed total must stay positive")
    }
    assert(got.keySet == want.keySet)
  }

  test("q212 median/MAD/outliers equal a driver-side interpolated-quantile replay; fences are robust") {
    val got = TextQueries.q212(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    def q50(xs: Array[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = s(pos.toInt)
      val hi = s(math.ceil(pos).toInt)
      lo + (pos - pos.toInt) * (hi - lo)
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = ev.groupBy(_._1).map { case (et, es) =>
      val vs = es.map(_._2)
      val med = q50(vs)
      val ads = vs.map(v => math.abs(v - med))
      val mad = q50(ads)
      val out = ads.count(_ > 3.0 * 1.4826 * mad).toLong
      et -> (vs.length.toLong, r4(med), r4(mad), out)
    }
    assert(got == want, s"engine $got vs replay $want")
    // non-vacuity: the fence must actually fire somewhere on this corpus
    assert(got.values.map(_._4).sum > 0L, "no outliers anywhere — vacuous")
  }

  test("q214 RANGE frame equals a value-bounded replay AND differs from a ROWS frame (gaps are real)") {
    val got = TextQueries.q214(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // driver replay: hourly DECIMAL totals, frame bounded by HOUR VALUE
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_type"),
        graft.streaming.EventStreams.epochMicros(col("ts")).as("us"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1) / 3600000000L, r.getDouble(2)))
    def d4(x: Double): BigDecimal =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val hourly = ev.groupBy(e => (e._1, e._2)).map { case ((et, h), es) =>
      (et, h, es.length.toLong, es.map(e => d4(e._3)).sum)
    }.toArray.sortBy(e => (e._1, e._2))
    def r2(x: BigDecimal): Double =
      x.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = hourly.map { case (et, h, n, tot) =>
      val frame = hourly.filter(o =>
        o._1 == et && o._2 >= h - 2 && o._2 <= h).map(_._4).sum
      (et, h, n, r2(tot), r2(frame))
    }
    assert(got.toSeq == want.toSeq, "RANGE frame diverges from the replay")
    // the frame KIND matters on this corpus: at least one hour's RANGE
    // total differs from what a ROWS(2 preceding) frame would produce,
    // i.e. some partition has an hour gap inside a 3-row window
    val rowsFrame = hourly.zipWithIndex.map { case ((et, h, n, tot), i) =>
      val back = hourly.slice(math.max(0, i - 2), i + 1)
        .filter(_._1 == et).map(_._4).sum
      (et, h, r2(back))
    }
    val differs = want.zip(rowsFrame).exists { case ((et, h, _, _, rng), (_, _, rws)) =>
      rng != rws
    }
    assert(differs,
      "ROWS and RANGE agree everywhere — the fixture has no hour gaps " +
        "and the frame kind is untested")
  }

  test("q215 streaks equal a driver-side consecutive-run scan; multi-day streaks exist") {
    val got = TextQueries.q215(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val days = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"),
        graft.streaming.EventStreams.epochMicros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1) / 86400000000L))
      .distinct
    val want = days.groupBy(_._1).map { case (u, ds) =>
      val sorted = ds.map(_._2).sorted
      val runs = sorted.foldLeft(List.empty[List[Long]]) {
        case (acc @ (run :: rest), d) if d == run.head + 1 =>
          (d :: run) :: rest
        case (acc, d) => List(d) :: acc
      }.map(_.length.toLong)
      u -> (runs.max, runs.length.toLong, runs.sum)
    }
    assert(got == want, "streaks diverge from the driver-side run scan")
    assert(got.values.exists(_._1 >= 2L),
      "no multi-day streak anywhere — the islands construction is untested")
    assert(got.values.exists(v => v._2 >= 2L),
      "every user has one unbroken run — gaps never segment anything")
  }

  test("q216 rules equal a driver-side basket replay; identities hold (symmetry, support bounds)") {
    val got = TextQueries.q216(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val items = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).distinct
    val nUsers = items.map(_._1).distinct.length.toLong
    val single = items.groupBy(_._2).map { case (t, xs) =>
      t -> xs.length.toLong
    }
    val pairCnt = items.groupBy(_._1).toSeq
      .flatMap { case (_, xs) =>
        val ts = xs.map(_._2).toSeq
        for (a <- ts; b <- ts if a != b) yield (a, b)
      }.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == pairCnt.keySet)
    got.foreach { case ((x, y), (nxy, sup, conf, lift)) =>
      assert(nxy == pairCnt((x, y)))
      assert(sup == r6(nxy.toDouble / nUsers))
      assert(conf == r6(nxy.toDouble / single(x)))
      assert(lift == r6((nxy.toDouble * nUsers.toDouble) /
        (single(x).toDouble * single(y).toDouble)))
      // pair counts are symmetric; lift is too (same formula both ways)
      assert(got((y, x))._1 == nxy)
    }
  }

  test("q217 growth accounting: identities bind (active = new + returning, cum = distinct-to-date)") {
    val got = TextQueries.q217(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val days = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"),
        graft.streaming.EventStreams.epochMicros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1) / 86400000000L))
      .distinct
    got.foreach { case (d, active, nw, ret, cum) =>
      assert(active == days.count(_._2 == d), s"day $d active")
      assert(nw + ret == active, s"day $d partition")
      // the cheap running-sum-of-new IS distinct-users-to-date
      assert(cum == days.filter(_._2 <= d).map(_._1).distinct.length.toLong,
        s"day $d cumulative")
    }
    assert(got.map(_._3).sum > 0L, "no returning users — vacuous")
    val cums = got.map(_._5)
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
  }
}
