package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q230/q231 — the privacy-release pair: the RR mechanism replayed
  * driver-side coin-for-coin, and the k-anonymity ladder's conservation
  * + floor guarantees. Cross-engine exactness is gated by the DuckDB
  * oracle; here we prove the MECHANISMS do what the privacy math says. */
class PrivacySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  /** The portable token hash (TokenHashExpr) in plain Scala. */
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

  test("q230 randomized response: coin-for-coin replay and exact debias identity") {
    val got = Privacy.q230(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // driver-side replay of the whole mechanism
    val bySrc = docs.groupBy(_._2)
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, rows) =>
      val n = rows.length.toLong
      val truePos = rows.count(_._3 == "zh").toLong
      val reported = rows.count { case (id, _, lang) =>
        val s = lang == "zh"
        val flip = math.floorMod(tokenHash(s"rr|$id"), 4L) == 0L
        s != flip
      }.toLong
      val est = (4L * reported - n).toDouble / 2.0
      assert(got(src) == ((n, truePos, reported, est, est - truePos)),
        s"source $src mechanism mismatch")
    }
    // the corpus-wide flip rate is the keyed coin's 1/4, within the
    // binomial envelope for this corpus size (deterministic, so this
    // pins the coin's uniformity, not luck)
    val flips = docs.count { case (id, _, _) =>
      math.floorMod(tokenHash(s"rr|$id"), 4L) == 0L
    }
    val rate = flips.toDouble / docs.length
    assert(rate > 0.15 && rate < 0.35, s"flip rate $rate")
    // debias is unbiased algebra: summing est over sources must land
    // within half the flip noise of the true total
    val estTotal = got.values.map(_._4).sum
    val trueTotal = got.values.map(_._2).sum.toDouble
    assert(math.abs(estTotal - trueTotal) <=
      2.0 * math.sqrt(docs.length.toDouble), // ~4σ of Bin(n, 3/16)·2
      s"debiased total $estTotal vs true $trueTotal")
  }

  test("q231 k-anonymity: conservation, class floors, and ladder shape") {
    val k = 5L
    val rows = Privacy.q231(spark, dir).collect().map(r =>
      (r.getInt(0),
        Option(r.get(1)).map(_.asInstanceOf[Int]),
        Option(r.get(2)).map(_.asInstanceOf[String]),
        Option(r.get(3)).map(_.asInstanceOf[Int]),
        r.getLong(4)))
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    // conservation: every individual lands in exactly one released class
    assert(rows.map(_._5).sum === nCust)
    rows.foreach { case (level, nat, seg, bkt, n) =>
      level match {
        case 0 =>
          assert(nat.isDefined && seg.isDefined && bkt.isDefined)
          assert(n >= k, s"level-0 class below k: $n")
        case 1 =>
          assert(nat.isDefined && seg.isDefined && bkt.isEmpty)
          assert(n >= k, s"level-1 class below k: $n")
        case 2 =>
          assert(nat.isEmpty && seg.isEmpty && bkt.isEmpty)
        case other => fail(s"unexpected level $other")
      }
    }
    // at most one suppression row, and the ladder is non-vacuous at
    // this fixture (some rows escalate past full QI resolution)
    assert(rows.count(_._1 == 2) <= 1)
    assert(rows.exists(_._1 >= 1), "fixture never escalates — vacuous")
    // released level-0/1 classes are genuinely k-anonymous vs the raw
    // table: recount each class's population independently
    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getString(1),
        math.floor(r.getDouble(2) / 1000.0).toInt))
    rows.filter(_._1 == 0).foreach { case (_, nat, seg, bkt, n) =>
      val pop = cust.count(c =>
        c._1 == nat.get && c._2 == seg.get && c._3 == bkt.get)
      assert(pop.toLong === n, s"level-0 class ($nat,$seg,$bkt) recount")
    }
    rows.filter(_._1 == 1).foreach { case (_, nat, seg, _, n) =>
      // level-1 class size counts ONLY the escalated rows, and its
      // released population can never exceed the raw (nat, seg) count
      val pop = cust.count(c => c._1 == nat.get && c._2 == seg.get)
      assert(n <= pop, s"level-1 class ($nat,$seg) exceeds raw population")
    }
  }
}
