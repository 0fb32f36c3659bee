package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q129 integer-PageRank specs: the engine's 5-iteration distributed
  * recurrence vs an independent driver-side Scala replay over the same
  * edge list, plus the structural invariants (mass bounds, isolated-
  * vertex rank). Cross-engine exactness is gated by the DuckDB oracle. */
class GraphRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  private def free(df: org.apache.spark.sql.DataFrame): Unit =
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(df)

  test("q129 matches a driver-side replay of the integer recurrence") {
    val out = GraphRank.q129(spark, dir)
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    free(out)

    // independent edge list: same definition, separate plan
    val docs = graft.core.Tables(spark, dir, "documents")
    val postings = Ranking.gramCountsOf(docs)
      .select(col("doc_id"), col("gram"))
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))))
      .where(col("df") <= 50)
    val pairs = postings.as("a").join(postings.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= 3)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0))

    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = ids.length.toLong
    val r0 = GraphRank.Scale / n
    val base = (15L * r0) / 100L
    var rank = ids.map(_ -> r0).toMap
    (1 to 5).foreach { _ =>
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) =>
          (85L * (rank(src) / deg(src))) / 100L
        }.sum
      }
      rank = ids.map(id => id -> (base + in.getOrElse(id, 0L))).toMap
    }

    assert(got.keySet == rank.keySet)
    got.foreach { case (id, (r, nl)) =>
      assert(r == rank(id), s"doc $id rank $r != ${rank(id)}")
      assert(nl == deg.getOrElse(id, 0L), s"doc $id n_links")
    }
  }

  test("q129 mass bounds: every rank >= teleport base, total <= Scale") {
    val out = GraphRank.q129(spark, dir)
    val rows = out.collect()
    free(out)
    val n = rows.length.toLong
    val base = (15L * (GraphRank.Scale / n)) / 100L
    rows.foreach(r => assert(r.getLong(1) >= base))
    assert(rows.map(_.getLong(1)).sum <= GraphRank.Scale)
    // isolated vertices hold exactly the teleport mass
    rows.filter(_.getInt(2) == 0).foreach(r =>
      assert(r.getLong(1) == base, s"isolated doc ${r.getLong(0)}"))
  }

  test("q153 trust stays on and around the seed set") {
    val out = GraphRank.q153(spark, dir)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    free(out)
    val nSeeds = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("source") === "src0").count()
    assert(rows.count(_._2) === nSeeds,
      "every seed holds trust (the teleport term is theirs)")
    assert(rows.exists(r => !r._2 && r._3 > 0),
      "trust must propagate beyond the seed set on this corpus")
    assert(rows.map(_._3).sum <= GraphRank.Scale,
      "mass only evaporates, never inflates")
    assert(rows.forall(_._3 > 0), "zero-trust rows are filtered")
  }

  test("q202 LPA matches a driver-side replay; sizes self-consistent; partition-count invariant") {
    val out = GraphRank.q202(spark, dir)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    free(out)
    // community sizes are self-consistent with membership
    val byCommunity = rows.groupBy(_._2)
    rows.foreach { case (id, c, sz) =>
      assert(sz == byCommunity(c).length.toLong,
        s"doc $id community $c claims size $sz")
    }
    // independent replay: same edge definition, driver-side sync rounds
    // with the identical (count desc, label asc) tie-break
    val docs = graft.core.Tables(spark, dir, "documents")
    val postings = Ranking.gramCountsOf(docs)
      .select(col("doc_id"), col("gram"))
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))))
      .where(col("df") <= 50)
    val pairs = postings.as("a").join(postings.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= 3)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val verts = edges.map(_._1).distinct
    var label = verts.map(v => v -> v).toMap
    (1 to 5).foreach { _ =>
      val votes = edges.groupBy(_._2).map { case (dst, es) =>
        val counted = es.map(e => label(e._1))
          .groupBy(identity).map { case (l, xs) => (l, xs.size) }
        dst -> counted.minBy { case (l, c) => (-c, l) }._1
      }
      label = verts.map(v => v -> votes(v)).toMap
    }
    assert(rows.map(r => r._1 -> r._2).toMap == label,
      "engine communities diverge from the driver-side sync-LPA replay")
    assert(rows.exists(_._3 >= 2L),
      "fixture produced only singleton communities — vacuous")
    // partition-count invariance: the arg-max encoding is an integer
    // aggregate, so shuffle layout must not leak into labels
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      val runs = Seq("3", "5").map { p =>
        spark.conf.set(key, p)
        val df = GraphRank.q202(spark, dir)
        val r = df.collect().map(_.toSeq).toSeq
        free(df)
        r
      }
      assert(runs(0) == runs(1), "q202 depends on partition count")
    } finally spark.conf.set(key, saved)
  }

  test("q218 incremental LPA: sizes self-consistent, batch docs join standing communities, partition-count invariant") {
    val out = GraphRank.q218(spark, dir)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    free(out)
    assert(rows.nonEmpty)
    // community sizes are self-consistent with membership
    val byCommunity = rows.groupBy(_._2)
    rows.foreach { case (id, c, sz, isBatch) =>
      assert(sz == byCommunity(c).length.toLong,
        s"doc $id community $c claims size $sz")
      assert(isBatch == (id % 10 >= 7), s"doc $id is_batch flag")
    }
    // the ingest is non-vacuous BOTH ways: batch docs appear, and at
    // least one batch doc lands in a community anchored by a base doc
    // (the warm-start actually propagated a standing label)
    assert(rows.exists(_._4), "no batch docs in the linked graph")
    assert(rows.exists(r => r._4 && r._2 % 10 < 7),
      "no batch doc joined a standing community — warm start untested")
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      val runs = Seq("3", "5").map { p =>
        spark.conf.set(key, p)
        val df = GraphRank.q218(spark, dir)
        val r = df.collect().map(_.toSeq).toSeq
        free(df)
        r
      }
      assert(runs(0) == runs(1), "q218 depends on partition count")
    } finally spark.conf.set(key, saved)
  }

  test("q226 HITS matches a driver-side replay of the integer recurrence") {
    val out = GraphRank.q226(spark, dir)
    val rows = out.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    free(out)
    // independent edge list: same definition, separate plan
    val edges = graft.core.Tables(spark, dir, "orders")
      .join(graft.core.Tables(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val custs = edges.map(_._1).distinct
    val parts = edges.map(_._2).distinct
    def renorm(m: Map[Long, Long]): Map[Long, Long] = {
      val s = m.values.sum
      val d = math.max(1L, s / GraphRank.Scale)
      m.map { case (k, v) => k -> v / d }
    }
    var hub = custs.map(_ -> GraphRank.Scale / custs.length).toMap
    var auth = Map.empty[Long, Long]
    (1 to 4).foreach { _ =>
      auth = renorm(edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map(e => hub(e._1)).sum
      })
      hub = renorm(edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => auth(e._2)).sum
      })
    }
    val outDeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val inDeg = edges.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    assert(rows.keySet ==
      (custs.map("hub" -> _) ++ parts.map("auth" -> _)).toSet)
    custs.foreach { c =>
      assert(rows(("hub", c)) == ((hub(c), outDeg(c))), s"hub $c") }
    parts.foreach { p =>
      assert(rows(("auth", p)) == ((auth(p), inDeg(p))), s"auth $p") }
    // renormalization divides by floor(S/Scale), so each side's total
    // lands in [Scale/2, 2·Scale): bounded, never diverging
    assert(hub.values.sum < 2 * GraphRank.Scale)
    assert(auth.values.sum < 2 * GraphRank.Scale)
    assert(hub.values.sum > GraphRank.Scale / 2)
    assert(auth.values.sum > GraphRank.Scale / 2)
  }

  test("q227 seed distance matches a driver-side multi-source BFS") {
    val out = GraphRank.q227(spark, dir)
    val got = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    free(out)
    // independent BFS over the same edge definition
    val docs = graft.core.Tables(spark, dir, "documents")
    val postings = Ranking.gramCountsOf(docs)
      .select(col("doc_id"), col("gram"))
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))))
      .where(col("df") <= 50)
    val pairs = postings.as("a").join(postings.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= 3)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val seeds = docs.where(col("source") === "src0")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0))
    var dist = ids.map(id => id -> (if (seeds(id)) 0 else Int.MaxValue)).toMap
    (1 to 4).foreach { _ =>
      dist = dist.map { case (v, d) =>
        val best = adj.getOrElse(v, Array.empty[Long])
          .map(dist).filter(_ != Int.MaxValue)
        v -> (if (best.isEmpty) d else math.min(d, best.min + 1))
      }
    }
    assert(got.keySet == dist.keySet)
    got.foreach { case (id, h) =>
      val want = if (dist(id) == Int.MaxValue) -1 else dist(id)
      assert(h == want, s"doc $id hops $h != $want")
    }
    // non-vacuous: propagation reached beyond the seed set, and some
    // documents stay textually unlinked to the trusted slice
    assert(got.values.exists(h => h >= 1), "no doc at distance >= 1")
    assert(got.values.exists(_ == -1), "every doc reached — fixture too dense")
    seeds.foreach(s => assert(got(s) == 0, s"seed $s not at distance 0"))
  }
}
