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

  test("q111 oracle premise: LSH candidates have recall 1 on the planted-twin corpus at both gate SFs") {
    // the recall-1 premise of q111's DuckDB oracle (q111 scaladoc): the
    // per-pair miss probability at cosine ≈ 0.9999 is ~5e-24 and the
    // hyperplanes are hash-derived constants, so on this fixture the
    // verified LSH pair set EQUALS exact all-pairs — a fixed fact,
    // asserted at BOTH SFs the driver gates run at (ManifestSpec pattern)
    for (sf <- Seq(dir, "/root/testdata/sf0.01")) {
      val aug = Similarity.augmentedVecs(spark, sf)
      val an = Similarity.normalized(aug)
      val exact = Similarity.nearDupPairsOf(an, 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val lsh = Similarity.lshNearDupOf(aug, an, 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(lsh == exact,
        s"LSH recall < 1 on the planted fixture ($sf): " +
          s"missed=${exact.diff(lsh).take(5)} extra=${lsh.diff(exact).take(5)}")
      // non-vacuity: every planted twin must pair with its source
      val planted = Similarity.augmentedVecs(spark, sf)
        .where(col("vec_id") >= Similarity.PlantOffset)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      assert(planted.nonEmpty, s"$sf planted no twins — test is vacuous")
      val found = lsh.map { case (d1, d2, _) => (d1, d2) }
      planted.foreach { p =>
        assert(found.contains((p - Similarity.PlantOffset, p)),
          s"planted twin $p not recovered through the LSH bucket join")
      }
      // id-space safety: the offset must clear every real vec_id
      val maxReal = EmbeddingQueries.vecs(spark, sf)
        .agg(max(col("vec_id"))).collect()(0).getLong(0)
      assert(maxReal < Similarity.PlantOffset,
        s"PlantOffset collides with real ids (max $maxReal)")
    }
  }

  test("q111 LSH-path clusters equal the exact-path clusters on the planted corpus; storage freed") {
    // same collapse, two candidate sources: under the recall-1 premise
    // above they must be IDENTICAL — the spec that clears q105's
    // scale-path from 'documented but unexercised'
    val aug = Similarity.augmentedVecs(spark, dir)
    val exactPairs = Similarity.nearDupPairsOf(Similarity.normalized(aug), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exactPairs.nonEmpty, "no pairs at τ=0.9 on the planted corpus")
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    exactPairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val members = (exactPairs.map(_._1) ++ exactPairs.map(_._2)).distinct
    val expected = members.groupBy(find)
      .map { case (root, ms) =>
        (root, ms.length, ms.map(_.toString).sorted.mkString(","))
      }.toSeq.sortBy(_._1)

    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = Similarity.q111(spark, dir)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    assert(got == expected,
      "LSH-candidate clusters diverge from exact-candidate clusters")
    val pinned = sc.getPersistentRDDs.keySet.diff(before)
    assert(pinned.size <= 1, s"more than the result pinned: $pinned")
    assert(
      org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(out),
      "q111 result is not a direct checkpoint (storage contract)")
    assert(sc.getPersistentRDDs.keySet.diff(before).isEmpty,
      "q111 storage not freeable to zero")
  }

  test("q105's lsh candidate source plugs into the same collapse (param wiring)") {
    // on the UNplanted corpus at τ=0.4 LSH recall is poor by design (the
    // hyperplane regime is τ ≥ 0.9) — so don't compare values; assert the
    // parameterized path runs, collapses, and respects the contract
    val out = Similarity.q105(spark, dir, threshold = 0.4, candidates = "lsh")
    val n = out.count()
    assert(n >= 0)
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(out)
    intercept[IllegalArgumentException] {
      Similarity.q105(spark, dir, candidates = "bogus")
    }
  }

  test("q183 hard negatives: cross-label only, mined ranks differ from raw ANN, margins bind") {
    val hard = Similarity.hardNegatives(spark, dir).collect()
    assert(hard.length == 50, s"10 queries x k=5 expected, got ${hard.length}")
    hard.foreach { r =>
      assert(r.getInt(1) != r.getInt(3),
        s"same-label row leaked into hard negatives: $r")
    }
    hard.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(5)).sorted.toSeq == (1 to 5),
        s"query $q ranks not 1..5")
    }
    // non-vacuity: the label exclusion must actually change the answer —
    // the raw q32 top-5 contains same-label rows for some query, so that
    // query's mined neighbor set differs
    val raw = Similarity.annTopK(spark, dir).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }
    val mined = hard.groupBy(_.getLong(0)).map { case (q, rs) =>
      q -> rs.map(_.getLong(2)).toSet }
    assert(raw.keySet == mined.keySet)
    assert(raw.exists { case (q, ids) => mined(q) != ids },
      "label exclusion never changed a top-k — fixture vacuous")
    // margin binds to an independent recomputation of the hardest
    // positive for one query that has one (sim and pos both round-4)
    val withMargin = hard.filter(!_.isNullAt(6))
    assert(withMargin.nonEmpty, "no query had a same-label positive")
    val r0 = withMargin.head
    val qid = r0.getLong(0)
    import org.apache.spark.sql.functions.{col, max, round}
    import graft.queries.EmbeddingQueries.{dot, vecsNorm}
    val vn = vecsNorm(spark, dir)
    val qu = vn.where(col("vec_id") === qid)
      .select(col("u"), col("label")).head()
    val quLit = org.apache.spark.sql.functions
      .typedlit[Seq[Double]](qu.getSeq[Double](0))
    val posSim = vn
      .where(col("label") === qu.getInt(1) && col("vec_id") =!= qid)
      .select(max(round(dot(quLit, col("u")), 4)).as("m"))
      .head().getDouble(0)
    assert(math.abs(r0.getDouble(6) - (math.rint((r0.getDouble(4) - posSim) * 1e4) / 1e4)) < 1e-9,
      s"margin ${r0.getDouble(6)} != sim - posSim recomputation")
  }

  test("q184 IVF mining: bit-equal to q183 at nprobe=cells-1, recall monotone in nprobe") {
    val exact = Similarity.hardNegatives(spark, dir).collect().map(_.toSeq)
    val nLabels = graft.queries.EmbeddingQueries.vecs(spark, dir)
      .select("label").distinct().count().toInt
    // exactness anchor: probing every foreign cell IS the brute path
    val full = Similarity.hardNegativesIvf(spark, dir, nprobe = nLabels - 1)
      .collect().map(_.toSeq)
    assert(full.toSeq == exact.toSeq,
      "nprobe=cells-1 must reproduce q183 bit-for-bit")
    // recall (fraction of q183's mined pairs recovered) monotone in nprobe
    val exactPairs = exact.map(r => (r(0), r(2))).toSet
    val recalls = Seq(1, 3, nLabels - 1).map { np =>
      val got = Similarity.hardNegativesIvf(spark, dir, nprobe = np)
        .collect().map(r => (r.get(0), r.get(2))).toSet
      got.intersect(exactPairs).size.toDouble / exactPairs.size
    }
    assert(recalls == recalls.sorted, s"recall not monotone: $recalls")
    assert(recalls.last == 1.0)
    assert(recalls.head > 0.0, "nprobe=1 found nothing — fixture degenerate")
  }

  test("q190 filtered ANN: k always filled from eligible docs; post-filter would under-fill") {
    import org.apache.spark.sql.functions.col
    val out = Similarity.filteredAnn(spark, dir).collect()
    // pre-filter fills k for every query
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to 5),
        s"query $q did not fill k from eligible candidates")
    }
    // every neighbor's document passes the predicate
    val en = graft.core.Tables(spark, dir, "documents")
      .where(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    out.foreach(r => assert(en.contains(r.getLong(1)),
      s"neighbor ${r.getLong(1)} is not an eligible (en) doc"))
    // the contrast that justifies pre-filtering: post-filtering the
    // UNfiltered top-k under-fills k for at least one query on this
    // fixture (en is ~44% of docs, so a raw top-5 usually keeps non-en
    // rows), and agreement: where a pair appears in both, sims match
    val raw = Similarity.annTopK(spark, dir).collect()
    val rawKept = raw.filter(r => en.contains(r.getLong(1)))
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.length }
    assert(rawKept.values.exists(_ < 5),
      "post-filter never under-filled — fixture makes the contrast vacuous")
    val rawSims = raw.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.foreach { r =>
      rawSims.get((r.getLong(0), r.getLong(1))).foreach { s =>
        assert(s == r.getDouble(2), s"sim diverged from q32 for $r")
      }
    }
  }

  test("q183/q184 mining is partition-count invariant (P=3 vs P=5)") {
    // the repo-wide P-sweep discipline applied to the mining tier: the
    // per-query top-k windows, the conditional positive max, and q184's
    // cell-probe join must not let shuffle layout into the result
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      val runs = Seq("3", "5").map { p =>
        spark.conf.set(key, p)
        (Similarity.hardNegatives(spark, dir).collect().map(_.toSeq).toSeq,
          Similarity.hardNegativesIvf(spark, dir).collect().map(_.toSeq).toSeq)
      }
      assert(runs(0) == runs(1), "mined negatives depend on partition count")
      assert(runs(0)._1.nonEmpty)
    } finally spark.conf.set(key, saved)
  }

  test("q204 k-center picks match a driver-side Gonzalez replay and are partition-count invariant") {
    val out = Similarity.q204(spark, dir)
    val got = out.collect().map(r => (r.getInt(0), r.getLong(1)))
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(out)
    assert(got.length == 8 && got.map(_._1).toSeq == (0 to 7),
      s"expected rounds 0..7, got ${got.toSeq}")
    assert(got.map(_._2).distinct.length == 8, "a vector was picked twice")

    // independent driver-side replay with the IDENTICAL fold order:
    // ((0+t1)+t2)+... per distance, max-min with vec_id tie-break
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0d; var i = 0
      while (i < a.length) {
        val d = a(i) - b(i); acc += d * d; i += 1
      }
      acc
    }
    var picks = List(vecs.head._1)
    var md = vecs.map { case (id, v) => id -> sq(v, vecs.head._2) }.toMap
    val byId = vecs.toMap
    (1 to 7).foreach { _ =>
      val pick = vecs.map(_._1).minBy(id => (-md(id), id))
      picks = pick :: picks
      md = vecs.map { case (id, v) =>
        id -> math.min(md(id), sq(v, byId(pick)))
      }.toMap
    }
    assert(got.map(_._2).toSeq == picks.reverse,
      "engine picks diverge from the driver-side farthest-point replay")

    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      val runs = Seq("3", "5").map { p =>
        spark.conf.set(key, p)
        val df = Similarity.q204(spark, dir)
        val r = df.collect().map(_.toSeq).toSeq
        org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(df)
        r
      }
      assert(runs(0) == runs(1), "q204 depends on partition count")
    } finally spark.conf.set(key, saved)
  }

  test("q213 centroid-drift cosines equal a driver-side decimal-mean replay, bounded as true cosines") {
    val got = EmbeddingQueries.q213(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val rows = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def mean(vs: Array[Array[Double]], d: Int): Double = {
      // DECIMAL(28,14) sum replay: exact half-up 14-dp terms
      val s = vs.map(v => BigDecimal(v(d))
        .setScale(14, BigDecimal.RoundingMode.HALF_UP)).sum
      s.toDouble / vs.length
    }
    rows.groupBy(_._2).foreach { case (label, es) =>
      val base = es.filter(e => e._1 % 10 < 7).map(_._3)
      val cur = es.filter(e => e._1 % 10 >= 7).map(_._3)
      val (gb, gc, cos) = got(label)
      assert(gb == base.length.toLong && gc == cur.length.toLong)
      val mb = Array.tabulate(64)(mean(base, _))
      val mc = Array.tabulate(64)(mean(cur, _))
      def fold(a: Array[Double], b: Array[Double]): Double = {
        var acc = 0.0d; var i = 0
        while (i < 64) { acc += a(i) * b(i); i += 1 }
        acc
      }
      val want = BigDecimal(fold(mb, mc) /
        (math.sqrt(fold(mb, mb)) * math.sqrt(fold(mc, mc))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(cos == want, s"label $label: engine $cos vs replay $want")
    }
    // cosine range sanity: a genuine cosine, bounded by [-1, 1] (tiny
    // per-label splits at sf0.001 can legitimately anti-correlate)
    assert(got.values.forall(v => v._3 <= 1.0 && v._3 >= -1.0))
  }
}
