package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** Property-fuzz of the native Catalyst kernels against straightforward
  * Scala reference implementations on generated inputs (raw ScalaCheck
  * generators with fixed seeds, same style as MRJobPropertySpec). The
  * corpus-based specs pin the kernels on real data; these pin them on
  * adversarial shapes — empty arrays, single elements, repeated values,
  * negative and denormal-ish magnitudes. */
class KernelPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  private val vec: Gen[List[Double]] =
    Gen.choose(1, 48).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-10.0, 10.0)))

  private def sampleVecPair(seed: Long): (List[Double], List[Double]) = {
    val a = vec.pureApply(Gen.Parameters.default, Seed(seed))
    val b = vec.pureApply(Gen.Parameters.default, Seed(seed + 1000))
    val n = math.min(a.size, b.size)
    (a.take(n), b.take(n))
  }

  test("DotProductExpr / CosineSimExpr equal in-order Scala folds on fuzzed vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val pairs = (1L to 40L).map(sampleVecPair)
    val df = pairs.toDF("a", "b")
      .select(
        col("a"), col("b"),
        DotProductExpr.dot(col("a"), col("b")).as("dp"),
        CosineSimExpr.cosineSim(col("a"), col("b")).as("cs"))
      .collect()
    df.foreach { r =>
      val (a, b) = (r.getSeq[Double](0), r.getSeq[Double](1))
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
      }
      assert(r.getDouble(2) == dot, s"dot mismatch on $a · $b")
      val cs = dot / (math.sqrt(na) * math.sqrt(nb))
      assert(r.getDouble(3) == cs || (r.getDouble(3).isNaN && cs.isNaN),
        s"cosine mismatch on $a · $b")
    }
  }

  test("MaxRunLenExpr equals the HOF aggregate fold and groupBy-max on fuzzed arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // small alphabet → dense duplicate runs; include empty arrays
    val arrGen: Gen[List[String]] =
      Gen.choose(0, 40).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "")))
    val arrays = (1L to 60L).map(s =>
      arrGen.pureApply(Gen.Parameters.default, Seed(s)).sorted)
    val rows = arrays.toDF("gs")
      .select(
        col("gs"),
        MaxRunLenExpr.maxRunLen(col("gs")).as("native"),
        // the formulation the kernel replaced in q89 — kept as reference
        expr(
          """aggregate(gs,
            |  struct(cast(null as string) as prev, 0L as run, 0L as best),
            |  (a, x) -> struct(
            |    x as prev,
            |    if(x <=> a.prev, a.run + 1L, 1L) as run,
            |    greatest(a.best, if(x <=> a.prev, a.run + 1L, 1L)) as best),
            |  a -> a.best)""".stripMargin).as("hof"))
      .collect()
    rows.foreach { r =>
      val gs = r.getSeq[String](0)
      val want = if (gs.isEmpty) 0L
        else gs.groupBy(identity).values.map(_.size).max.toLong
      assert(r.getLong(1) == want, s"native mismatch on $gs")
      assert(r.getLong(2) == want, s"hof reference mismatch on $gs")
    }
  }

  private val text: Gen[String] =
    Gen.choose(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(('a' to 'f') ++ Seq(' ')))).map(_.mkString)

  test("WinnowFpExpr equals a reference winnowing implementation on fuzzed text") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val (k, w) = (3, 2)
    def reference(s: String): Seq[Long] = {
      val grams = s.length - k + 1
      val wins = grams - w + 1
      if (wins <= 0) return Seq.empty
      val gh = (0 until grams).map { i =>
        var p = 0L
        (0 until k).foreach(j => p = p * 31 + s.charAt(i + j))
        var x = p
        x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
        x ^= (x >>> 27); x *= 0x94D049BB133111EBL
        x ^= (x >>> 31)
        x
      }
      (0 until wins).map(i => (i until i + w).map(gh).min).distinct.sorted
    }
    val texts = (1L to 60L).map(s => text.pureApply(Gen.Parameters.default, Seed(s)))
    val got = texts.toDF("t")
      .select(col("t"), WinnowFpExpr.winnowFp(col("t"), k, w).as("fp"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) == reference(r.getString(0)),
        s"winnow mismatch on '${r.getString(0)}'")
    }
  }

  test("MinHashSigExpr: signature of a superset dominates elementwise (min-monotone)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val items: Gen[List[Long]] =
      Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, Gen.choose(Long.MinValue, Long.MaxValue)))
    val sets = (1L to 30L).map(s => items.pureApply(Gen.Parameters.default, Seed(s)))
    val rows = sets.map(s => (s, s ++ sets.head)).toDF("a", "ab")
      .select(
        MinHashSigExpr.minhashSig(col("a"), 32).as("sa"),
        MinHashSigExpr.minhashSig(col("ab"), 32).as("sab"))
      .collect()
    rows.foreach { r =>
      val (sa, sab) = (r.getSeq[Long](0), r.getSeq[Long](1))
      assert(sa.indices.forall(i => sab(i) <= sa(i)),
        "adding items must only lower per-permutation minima")
    }
  }

  test("TokenHashExpr equals the Scala poly31+splitmix64 reference on fuzzed strings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def ref(s: String): Long = {
      var p = 0L
      s.foreach(c => p = p * 31 + c)
      var x = p
      x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
      x ^= (x >>> 27); x *= 0x94D049BB133111EBL
      x ^= (x >>> 31)
      x
    }
    val strGen: Gen[String] =
      Gen.choose(0, 24).flatMap(n => Gen.listOfN(n,
        Gen.frequency(
          8 -> Gen.alphaLowerChar,
          2 -> Gen.choose('¡', '￿'))).map(_.mkString))
    val samples = (1L to 60L).map(seed =>
      strGen.pureApply(Gen.Parameters.default, Seed(seed))) ++
      Seq("", "a", "the", "a" * 40) // wrap the polynomial past 2^64
    val rows = samples.toDF("s")
      .select(col("s"), TokenHashExpr.tokenHash(col("s")).as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == ref(r.getString(0)),
        s"hash mismatch for ${r.getString(0)}")
    }
  }
}
