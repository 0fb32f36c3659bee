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
}
