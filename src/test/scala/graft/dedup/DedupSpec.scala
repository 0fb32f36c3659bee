package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  /** Pairs with exact word-set jaccard 1.0 (reordered copies) — computed
    * via the exact verifier, used as ground truth for the fuzzy tiers. */
  private lazy val exactDupPairs: Set[(Long, Long)] =
    Dedup.jaccardPairs(spark, dir, 1.0)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("winnowing: shared substring of length >= w+k-1 yields a shared fingerprint") {
    import spark.implicits._
    // disjoint alphabets: no accidental k-gram collision between A and B
    val a = "abcdefghijklm" * 12                      // doc 1: alphabet a–m
    val b = "nopqrstuvwxyz" * 12                      // doc 2: alphabet n–z
    val passage = a.substring(40, 60)                 // 20 chars >= w+k-1 = 8
    val c = b.substring(0, 70) + passage + b.substring(70) // doc 3: B + copied A passage
    val docs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val fps = Dedup.winnowFps(docs, k = 5, w = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bySet = fps.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    // guarantee: the copied passage contributes >=1 shared fingerprint
    assert((bySet(1L) intersect bySet(3L)).nonEmpty, "copied passage missed")
    // disjoint alphabets share nothing
    assert((bySet(1L) intersect bySet(2L)).isEmpty, "false sharing")
    // fingerprints per doc never exceed the k-gram count (winnowing selects)
    assert(bySet(1L).size <= a.length - 4)
  }

  test("winnowing: identical text gives identical fingerprint sets; pairs surface it") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val other = "completely different content with its own words " * 8
    val docs = Seq((10L, base), (11L, base), (12L, other)).toDF("doc_id", "text")
    val bySet = Dedup.winnowFps(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    assert(bySet(10L) == bySet(11L))
    assert(bySet(10L) != bySet(12L))
  }

  test("winnowPairs pins no storage after it completes (round-4 leak)") {
    // the round-4 shape localCheckpoint'ed the fingerprint table and never
    // freed it — every q65 run pinned its RDD for the session. The window
    // rewrite needs no materialization at all; after a full run, no NEW
    // persistent RDD may remain (other suites on the shared session may
    // legitimately hold theirs, so diff against the before-set)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    Dedup.winnowPairs(spark, dir).count()
    val leaked = sc.getPersistentRDDs.keySet.diff(before)
    assert(leaked.isEmpty, s"winnowPairs leaked persistent RDDs: $leaked")
  }

  test("connected components equal driver-side union-find on the same edges") {
    import spark.implicits._
    val edges = Dedup.minhashVerifiedPairs(spark, dir, 0.5, 0.7)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(v => v -> find(v)).toMap

    val labels = Components.connectedComponents(edges.toSeq.toDF("src", "dst"))
    val got = labels.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    Components.free(labels) // storage contract: caller frees once consumed
    assert(got == want)
    // min-label canonical keeper: every component label is its own member
    assert(got.forall { case (_, c) => got(c) == c })
  }

  test("q66/q80 leave only their bounded result checkpoint, freeable to zero") {
    // the corpus-vertex-sized label table must be freed inside the query;
    // what remains is the direct checkpoint of the presentation aggregate
    // (one row per cluster / per source), which Components.free releases
    val sc = spark.sparkContext
    for (q <- Seq(
        (s: org.apache.spark.sql.SparkSession, d: String) => Components.q66(s, d),
        (s: org.apache.spark.sql.SparkSession, d: String) =>
          graft.queries.Curation.q80(s, d))) {
      val before = sc.getPersistentRDDs.keySet
      val out = q(spark, dir)
      val rows = out.count()
      val pinned = sc.getPersistentRDDs.keySet.diff(before)
      assert(pinned.size <= 1, s"more than the result pinned: $pinned")
      pinned.foreach { id =>
        val rdd = sc.getPersistentRDDs(id)
        assert(rdd.count() == rows, "pinned RDD is not the bounded result")
      }
      Components.free(out)
      assert(sc.getPersistentRDDs.keySet.diff(before).isEmpty,
        "result checkpoint not freeable")
    }
  }

  test("connected components refuses to return a non-converged partition") {
    import spark.implicits._
    // a 5-vertex chain needs 4 rounds for label 0 to reach the far end
    val chain = (0L until 4L).map(i => (i, i + 1)).toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(chain, maxIters = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // the discarded partial result must not pin storage (failure path
    // frees the edge list AND the current round's checkpoint)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    assert(leaked.isEmpty, s"non-convergence path leaked RDDs: $leaked")
    // and with enough rounds the same chain is one component
    val ok = Components.connectedComponents(chain, maxIters = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.values.toSet == Set(0L))
  }

  test("q80 passage dedup drops exactly the non-keeper members of winnow clusters") {
    // minShared=2 on this fixture yields a dense pair graph (>1000 edges)
    // so multi-doc clusters actually form; default params keep the same
    // code path with a near-empty graph
    val ms = 2
    val pairs = Dedup.winnowPairs(spark, dir, ms).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length > 100, s"fixture too sparse: ${pairs.length} pairs")
    // driver-side union-find ground truth for the drop set
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val dropIds = parent.keys.filter(v => find(v) != v).toSet
    assert(dropIds.nonEmpty)

    val docs = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val wantDropped = docs.filter(d => dropIds(d._1)).groupBy(_._2)
      .map { case (s, xs) => s -> xs.length }
    val wantTotal = docs.groupBy(_._2).map { case (s, xs) => s -> xs.length }

    val got = graft.queries.Curation.q80(spark, dir, ms).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    got.foreach { case (s, n, dropped, kept) =>
      assert(n == wantTotal(s).toLong, s"$s total")
      assert(dropped == wantDropped.getOrElse(s, 0), s"$s dropped")
      assert(kept == n - dropped, s"$s kept+dropped!=total")
    }
    assert(got.map(_._1).toSet == wantTotal.keySet)
  }

  test("testdata contains reordered near-duplicates (sanity)") {
    assert(exactDupPairs.nonEmpty)
  }

  test("fingerprint dedup finds exactly the jaccard-1.0 groups") {
    val fpDocs = Dedup.fingerprintDups(spark, dir)
      .select(col("docs")).collect()
      .map(_.getString(0).split(",").map(_.toLong).sorted.toSeq).toSet
    // every fingerprint group of size n implies n*(n-1)/2 jaccard-1 pairs
    val fromFp = fpDocs.flatMap(g => g.combinations(2).map(p => (p(0), p(1))))
    assert(fromFp == exactDupPairs)
  }

  test("minhash LSH finds every high-similarity shingle pair (banding guarantee)") {
    // P(miss | j>=0.9) = (1-j^4)^32 ≈ 1e-15 — every such pair must appear
    val truth = Dedup.shingleJaccardPairs(spark, dir, 0.9)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "corpus should contain shingle near-dups")
    val mh = Dedup.minhashPairs(spark, dir, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    truth.foreach(p => assert(mh.contains(p), s"pair $p missed by LSH"))
  }

  test("simhash 16-bit-block candidates are COMPLETE vs brute force at hamming <= 3") {
    val sig = Dedup.simhashSignatures(spark, dir)
    val a = sig.select(col("doc_id").as("d1"), col("simhash").as("h1"))
    val b = sig.select(col("doc_id").as("d2"), col("simhash").as("h2"))
    val brute = a.join(b, col("d1") < col("d2"))
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .where(col("hamming") <= 3)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.simhashPairs(spark, dir, 3)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"missed: ${brute.diff(blocked).take(5)} extra: ${blocked.diff(brute).take(5)}")
  }

  test("simhash: multiset-identical docs have hamming 0") {
    val sh = Dedup.simhashPairs(spark, dir, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.nonEmpty)
  }

  test("verified-dedup (candidates + per-pair exact) equals all-pairs exact at j >= 0.9") {
    // banding captures j>=0.9 pairs with P ≈ 1-1e-15, and per-pair
    // array_intersect jaccard on hashed shingles equals string-shingle
    // jaccard (collision prob ~0) — so the scale-safe path must equal the
    // quadratic verifier exactly
    val truth = Dedup.shingleJaccardPairs(spark, dir, 0.9)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fast = Dedup.minhashVerifiedPairs(spark, dir, 0.5, 0.9)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    assert(fast == truth, s"missed: ${truth.diff(fast).take(3)} extra: ${fast.diff(truth).take(3)}")
  }

  test("minhash estimate tracks exact shingle jaccard within sampling tolerance") {
    val exact = Dedup.shingleJaccardPairs(spark, dir, 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val est = Dedup.minhashPairs(spark, dir, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(est.nonEmpty)
    est.foreach { case (p, e) =>
      val ex = exact.getOrElse(p, 0.0)
      assert(math.abs(ex - e) <= 0.15, s"pair $p exact=$ex est=$e")
    }
  }

  test("q106 incremental near-dup labels equal exact-jaccard split labeling") {
    // ground truth: exact all-pairs shingle Jaccard >= 0.7, split by the
    // q90 corpus convention (doc_id % 10 < 7), greedy suppress rule
    val pairs = Dedup.shingleJaccardPairs(spark, dir, 0.7)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def isCorpus(id: Long) = id % 10 < 7
    val dupC = pairs.collect {
      case (a, b) if isCorpus(a) != isCorpus(b) => if (isCorpus(a)) b else a
    }.toSet
    val dupB = pairs.collect {
      case (a, b) if !isCorpus(a) && !isCorpus(b) => b // d1 < d2: later is suppressed
    }.toSet
    assert(dupC.nonEmpty && dupB.nonEmpty, "fixture split has no cross/batch pairs — vacuous")

    val got = Dedup.q106(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, st) =>
      val want =
        if (dupC(id)) "neardup_corpus"
        else if (dupB(id)) "neardup_batch"
        else "new"
      assert(st == want, s"doc $id: got $st want $want")
      assert(!isCorpus(id), s"corpus doc $id leaked into the incoming labeling")
    }
    // the spine covers every incoming doc, including shingle-less ones
    val incoming = graft.core.Tables(spark, dir, "documents")
      .where(col("doc_id") % 10 >= 7).count()
    assert(got.size == incoming)
  }

  test("q109 bloom-accelerated dedup is row-identical to q90 and probes via bloom") {
    val want = Dedup.q90(spark, dir).collect().map(_.toSeq).toSeq
    val q109 = Dedup.q109(spark, dir)
    val got = q109.collect().map(_.toSeq).toSeq
    assert(got == want, "bloom pre-probe changed results — exactness broken")
    // non-vacuity: the fixture split must exercise all three labels
    val statuses = got.map(_(2)).toSet
    assert(statuses == Set("dup_existing", "dup_batch", "new"),
      s"fixture labels $statuses — bloom path not fully exercised")
    // plan shape: the probe predicate is the runtime-filter expression
    // with the sketch riding as a scalar subquery (computed once,
    // broadcast with the plan), NOT a joined column
    val plan = q109.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom probe missing from plan")
    assert(plan.toLowerCase.contains("subquery"),
      "bloom sketch is not a scalar subquery")
  }

  test("q122 histogram partitions the corpus and agrees with q66's clusters") {
    val hist = Components.q122(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // the histogram is a PARTITION of the corpus: sizes weighted by
    // cluster counts must sum to the document total
    val nDocs = graft.core.Tables(spark, dir, "documents").count()
    assert(hist.map { case (sz, n) => sz.toLong * n }.sum == nDocs)
    // cross-query consistency: q66's per-cluster sizes histogrammed +
    // the singleton remainder must equal q122 exactly
    val q66df = Components.q66(spark, dir)
    val q66Sizes = q66df.collect().map(_.getInt(1).toLong)
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(q66df)
    val want = q66Sizes.groupBy(identity).map { case (sz, xs) =>
      sz.toInt -> xs.length.toLong
    } + (1 -> (nDocs - q66Sizes.sum))
    assert(hist == want, s"histogram $hist != q66-derived $want")
    assert(hist.keySet.exists(_ >= 2), "fixture has no non-trivial cluster")
  }

  test("q125 effective mix is consistent with q122's clusters; shares sum to 1") {
    val mixDf = Components.q125(spark, dir)
    val mix = mixDf.collect().map(r => (r.getLong(1), r.getLong(2),
      r.getLong(4), r.getDouble(5)))
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(mixDf)
    val histDf = Components.q122(spark, dir)
    val dropped = histDf.collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .map { case (sz, n) => (sz - 1).toLong * n }.sum
    org.apache.spark.sql.graftbridge.Bridge.freeIfDirectCheckpoint(histDf)
    val nDocs = graft.core.Tables(spark, dir, "documents").count()
    assert(mix.map(_._1).sum == nDocs, "per-source doc counts must tile the corpus")
    assert(mix.map(_._2).sum == nDocs - dropped,
      "kept docs must equal corpus minus every cluster's non-keepers")
    assert(mix.exists(m => m._2 < m._1), "fixture dedup must bite somewhere")
    // 6-decimal rounding x sources bounds the share-sum drift
    assert(math.abs(mix.map(_._4).sum - 1.0) < 1e-4,
      s"mix shares sum to ${mix.map(_._4).sum}")
  }

  test("prefix-filtered joins equal their quadratic verifiers bit-for-bit (lossless theorem, live)") {
    // q169 == q28 and q170 == q43 at the declared threshold: the prefix
    // filter is complete, so the outputs are identical — including the
    // rounded jaccard values.
    val exactW = Dedup.jaccardPairs(spark, dir, 0.8)
      .collect().map(_.toSeq).toSeq
    val ppW = Dedup.prefixJaccardPairs(spark, dir, 0.8)
      .collect().map(_.toSeq).toSeq
    assert(ppW === exactW, "word-set prefix join diverged from all-pairs")
    assert(exactW.nonEmpty, "fixture must exercise the tau=0.8 word tier")
    val exactG = Dedup.charGramJaccardPairs(spark, dir, 0.8)
      .collect().map(_.toSeq).toSeq
    val ppG = Dedup.prefixCharGramJaccardPairs(spark, dir, 0.8)
      .collect().map(_.toSeq).toSeq
    assert(ppG === exactG, "char-gram prefix join diverged from all-pairs")
  }

  test("the prefix index is a strict subset of the postings (the pruning is real)") {
    val sets = Dedup.wordSets(spark, dir).withColumnRenamed("words", "items")
    val w = sets.select(col("doc_id"), explode(col("items")).as("item"))
    val nPost = w.count()
    // re-derive the prefix size the way the join builds it
    val dfq = w.groupBy(col("item")).agg(count(lit(1)).as("df"))
    val wd = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val nPrefix = w.join(dfq, Seq("item"))
      .withColumn("t", count(lit(1)).over(wd))
      .withColumn("rn", row_number().over(wd.orderBy(col("df"), col("item"))))
      .where(col("rn") <= col("t") - ceil(lit(0.8) * col("t")) + 1)
      .count()
    assert(nPrefix < nPost / 2,
      s"prefix index $nPrefix not meaningfully smaller than $nPost")
    assert(nPrefix > 0)
  }

  test("bench-exclusion evidence regenerates: the pair-LISTING task is output-bound and barely tau-sensitive (sf0.01)") {
    // Bench.scala excludes q28/q43/q169/q170 from the headline set on a
    // MEASURED claim: this fixture's planted duplicate clusters make the
    // qualifying-pair output itself Θ(Σ cluster²), and tightening τ does
    // not rescue the pair list because near-copies share even their
    // rarest tokens. Those measurements regenerate here at sf0.01 so the
    // exclusion's evidence can never rot while the fixture or the join
    // changes underneath it.
    val sets = Dedup.wordSets(spark, graft.SparkTest.sf001)
      .withColumnRenamed("words", "items")
    val nDocs = sets.count()
    val cand08 = Dedup.prefixCandidates(sets, 0.8).count()
    val cand095 = Dedup.prefixCandidates(sets, 0.95).count()
    // output-bound: candidates dwarf the corpus (quadratic in cluster
    // size, not linear in docs) — the all-pairs component no algorithm
    // that LISTS the pairs avoids
    assert(cand08 > 10L * nDocs,
      s"candidate pairs $cand08 vs $nDocs docs — the output-bound claim " +
        "no longer holds; revisit the bench exclusion")
    // τ-insensitive: the STRICTEST practical threshold keeps the bulk of
    // the candidates (clusters share their rarest tokens), so no τ
    // rescues the pair list
    assert(cand095 * 2 > cand08,
      s"τ=0.95 candidates $cand095 vs τ=0.8 $cand08 — tightening τ now " +
        "prunes most pairs; the exclusion rationale needs re-measuring")
  }

  test("q209 deletion-neighborhood blocking is LOSSLESS: equals brute-force all-pairs levenshtein") {
    val got = Dedup.q209(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    // brute force over the bounded distinct-name set — the completeness
    // theorem under test: blocking must surface EVERY pair within k=2
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_name")).distinct().collect().map(_.getString(0))
    val want = (for {
      a <- names; b <- names if a < b
      dd = lev(a, b) if dd <= 2
    } yield (a, b, dd)).sortBy(p => (p._1, p._2))
    assert(got.toSeq == want.toSeq,
      "blocking missed or fabricated a pair — FastSS completeness broken")
    // non-vacuity: both the substitution (d=1 via shared deletion) and
    // the two-edit class must be exercised by the fixture
    assert(got.exists(_._3 == 1) && got.exists(_._3 == 2),
      s"fixture distances ${got.map(_._3).toSet} — blocking paths untested")
  }
}
