package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.queries.EmbeddingQueries

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("native cosine expression equals HOF formulation on all pairs of first 50 vectors") {
    val v = EmbeddingQueries.vecs(spark, dir).where(col("vec_id") < 50)
    val a = v.select(col("vec_id").as("d1"), col("v").as("v1"))
    val b = v.select(col("vec_id").as("d2"), col("v").as("v2"))
    val both = a.join(b, col("d1") < col("d2"))
      .select(
        EmbeddingQueries.cosine(col("v1"), col("v2")).as("native"),
        EmbeddingQueries.cosineHof(col("v1"), col("v2")).as("hof"))
      .where(abs(col("native") - col("hof")) > 1e-12)
    assert(both.count() == 0)
  }

  test("cosine(v, v) == 1 for all vectors") {
    val v = EmbeddingQueries.vecs(spark, dir)
    val bad = v.select(round(EmbeddingQueries.cosine(col("v"), col("v")), 6).as("c"))
      .where(col("c") =!= 1.0).count()
    assert(bad == 0)
  }

  test("annTopK returns k neighbors per query, sims non-increasing") {
    val k = 5
    val rows = Similarity.annTopK(spark, dir, k = k, nQueries = 10).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.length == k)
      val sims = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(sims == sims.sorted.reverse, s"sims not descending: $sims")
    }
  }

  test("LSH near-dup pairs are a subset of brute-force pairs at same threshold") {
    val brute = Similarity.nearDupPairs(spark, dir, 0.3)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearDup(spark, dir, 0.3, tables = 16, bits = 6)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty, "LSH found no candidates at all")
    assert(lsh.subsetOf(brute), s"LSH produced non-pairs: ${lsh.diff(brute).take(3)}")
    // recall sanity: 16 tables × 6 bits should catch a decent fraction
    assert(lsh.size >= brute.size / 4,
      s"recall too low: ${lsh.size}/${brute.size}")
  }

  test("IVF search returns top-k within the probed cell and agrees with brute force there") {
    val ivf = Similarity.annIvf(spark, dir, k = 3, nQueries = 5).collect()
    assert(ivf.groupBy(_.getLong(0)).forall(_._2.length == 3))
  }

  test("IVF multi-probe recall vs brute force is monotone in nprobe") {
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = hits(Similarity.annTopK(spark, dir, k = 3, nQueries = 5))
    val recalls = Seq(1, 3, 10).map { np =>
      val got = hits(Similarity.annIvfKmeans(spark, dir, k = 3, nQueries = 5,
        cells = 10, iters = 2, nprobe = np))
      (got intersect brute).size.toDouble / brute.size
    }
    assert(recalls == recalls.sorted, s"recall not monotone: $recalls")
    // probing every cell IS brute force (k-means partitions the corpus)
    assert(recalls.last == 1.0, s"full probe recall ${recalls.last} != 1")
  }

  test("q105 semantic clusters equal driver union-find over the cosine pairs; storage freed") {
    val pairs = Similarity.nearDupPairs(spark, dir, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no cosine near-dup pairs — vacuous")
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val members = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
    val expected = members.groupBy(find)
      .map { case (root, ms) =>
        (root, ms.length, ms.map(_.toString).sorted.mkString(","))
      }.toSeq.sortBy(_._1)

    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = Similarity.q105(spark, dir)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got == expected)
    // label table freed inside; only the bounded result checkpoint remains
    val pinned = sc.getPersistentRDDs.keySet.diff(before)
    assert(pinned.size <= 1, s"more than the result pinned: $pinned")
    assert(
      org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(out),
      "q105 result is not a direct checkpoint (storage contract)")
    assert(sc.getPersistentRDDs.keySet.diff(before).isEmpty,
      "q105 storage not freeable to zero")
  }
}
