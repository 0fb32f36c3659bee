package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q241 — item-item CF: full driver-side replay of the co-occurrence
  * cosine and the top-3 selection, plus the structural guarantee that
  * the scale cap (256 parts per basket) does not bind on the fixture —
  * which is what makes the DuckDB oracle exact end-to-end here. */
class RecommendSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("q241 matches a literal driver-side CF replay; the cap is slack") {
    val df = Recommend.q241(spark, dir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(df)

    val edges = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .select("o_custkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the 256-part cap must be slack, or the oracle's exactness claim
    // (and this replay) silently measures the estimator instead
    val maxBasket = edges.groupBy(_._1).values.map(_.size).max
    assert(maxBasket < 256, s"fixture basket $maxBasket reached the cap")

    val n = edges.groupBy(_._2).map { case (p, es) => p -> es.size.toLong }
    val co = scala.collection.mutable.Map.empty[(Long, Long), Long]
    edges.groupBy(_._1).values.foreach { basket =>
      val ps = basket.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        co((ps(i), ps(j))) = co.getOrElse((ps(i), ps(j)), 0L) + 1L
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sym = co.toSeq.flatMap { case ((a, b), c) =>
      Seq((a, b, c), (b, a, c)) }
    val want = sym.groupBy(_._1).flatMap { case (part, ns) =>
      ns.map { case (_, other, c) =>
        (other, c, r6(c.toDouble / math.sqrt(n(part).toDouble * n(other))))
      }.sortBy { case (other, c, cos) => (-cos, -c, other) }
        .take(3).zipWithIndex
        .map { case (row, i) => (part, i + 1) -> row }
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (k, w) =>
      assert(got(k) == w, s"part ${k._1} rank ${k._2}: ${got(k)} vs $w")
    }
    // affinity sanity: cosine bounded, co bounded by both basket counts
    got.foreach { case ((part, _), (other, c, cos)) =>
      assert(cos > 0.0 && cos <= 1.0)
      assert(c <= math.min(n(part), n(other)))
    }
  }

  test("q244 incremental ingest merge equals the monolithic pair counts") {
    val df = Recommend.q244(spark, dir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(df)
    // monolithic replay: full distinct edges, full pair counts, delta =
    // incidences touching a batch-novel edge
    val raw = spark.read.parquet(s"$dir/orders.parquet")
      .join(spark.read.parquet(s"$dir/lineitem.parquet"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .select("o_orderkey", "o_custkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val base = raw.filter(_._1 % 10 < 7).map(e => (e._2, e._3)).toSet
    val full = raw.map(e => (e._2, e._3)).toSet
    val novel = full -- base
    val want = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    full.groupBy(_._1).values.foreach { basket =>
      val ps = basket.map(_._2).toSeq.sorted
      val c = basket.head._1
      for (i <- ps.indices; j <- (i + 1) until ps.length) {
        val touched = novel((c, ps(i))) || novel((c, ps(j)))
        val k = (ps(i), ps(j))
        val (d0, f0) = want.getOrElse(k, (0L, 0L))
        want(k) = (d0 + (if (touched) 1L else 0L), f0 + 1L)
      }
    }
    val wantTouched = want.filter(_._2._1 > 0).toMap
    assert(got.keySet == wantTouched.keySet)
    wantTouched.foreach { case (k, w) =>
      assert(got(k) == w, s"pair $k: ${got(k)} vs $w") }
    // non-vacuous both ways: brand-new pairs appear (co_base was 0) and
    // standing pairs increment (co_after > delta)
    assert(got.values.exists { case (d, a) => d == a },
      "no pair born in the batch")
    assert(got.values.exists { case (d, a) => a > d },
      "no standing pair incremented")
  }
}
