package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** The SQL surface of the native kernels: both registration paths
  * (runtime registry + SparkSessionExtensions injection at session
  * construction) must yield functions whose SQL results equal the
  * Column API. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark

  test("runtime-registered SQL functions equal the Column API") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0), "abcdefghijklmno"))
      .toDF("a", "b", "t")
    df.createOrReplaceTempView("gx")

    val viaSql = spark.sql(
      """SELECT cosine_sim(a, b) AS cs, dot_product(a, b) AS dp,
        |  winnow_fp(t, 5, 4) AS fp FROM gx""".stripMargin).collect()(0)
    val viaCol = df.select(
      CosineSimExpr.cosineSim(col("a"), col("b")).as("cs"),
      DotProductExpr.dot(col("a"), col("b")).as("dp"),
      WinnowFpExpr.winnowFp(col("t"), 5, 4).as("fp")).collect()(0)
    assert(viaSql.getDouble(0) == viaCol.getDouble(0))
    assert(viaSql.getDouble(1) == viaCol.getDouble(1))
    assert(viaSql.getSeq[Long](2) == viaCol.getSeq[Long](2))

    val runLen = spark.sql(
      "SELECT max_run_len(array('a', 'a', 'b')) AS m").collect()(0).getLong(0)
    assert(runLen == 2L)

    val sig = spark.sql(
      "SELECT minhash_sig(array(1L, 2L, 3L), 16) AS s").collect()(0).getSeq[Long](0)
    assert(sig.length == 16)

    val th = spark.sql(
      "SELECT token_hash('the') AS h").collect()(0).getLong(0)
    val thCol = df.select(
      TokenHashExpr.tokenHash(lit("the")).as("h")).collect()(0).getLong(0)
    assert(th == thCol)
  }

  test("non-literal config arg is rejected with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array(1L), CAST(id AS INT)) FROM range(1)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }

  test("optimizer rule rewrites HOF dot/cosine patterns to native kernels") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // the textbook HOF formulations a SQL user would write
      val df = s2.sql(
        """SELECT
          |  aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d,
          |            (acc, v) -> acc + v) AS dp,
          |  aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d,
          |            (acc, v) -> acc + v)
          |    / (sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), 0.0d,
          |                      (acc, v) -> acc + v))
          |     * sqrt(aggregate(zip_with(b, b, (x, y) -> x * y), 0.0d,
          |                      (acc, v) -> acc + v))) AS cs
          |FROM (SELECT array(CAST(id AS DOUBLE), 2.0d, 3.0d) AS a,
          |             array(4.0d, 5.0d, 6.0d) AS b
          |      FROM range(1, 2))""".stripMargin)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("dot_product"),
        "HOF dot not rewritten:\n" + optimized)
      assert(optimized.contains("cosine_sim"),
        "dot/norms not fused to cosine:\n" + optimized)
      assert(!optimized.contains("aggregate(zip_with"),
        "HOF survived:\n" + optimized)
      // bit-identical to the unrewritten evaluation (same fold order)
      val row = df.collect()(0)
      assert(row.getDouble(0) == 32.0)
      val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
      assert(row.getDouble(1) == expected)
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }

  test("rewrite preserves HOF NULL semantics on ragged-length arrays") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // unrewritten semantics: zip_with pads the short side with nulls,
      // null*y poisons the fold → NULL. The rewritten plan must agree.
      val r = s2.sql(
        """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d,
          |                 (acc, v) -> acc + v) AS dp
          |FROM (SELECT array(CAST(id AS DOUBLE), 2.0d) AS a,
          |             array(3.0d) AS b FROM range(1, 2))""".stripMargin)
        .collect()(0)
      assert(r.isNullAt(0), s"ragged-length dot must be NULL, got $r")
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }

  test("cosine fusion preserves Divide zero-norm semantics (ANSI error / non-ANSI NULL)") {
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // zero-norm a (non-foldable so evaluation happens at runtime);
      // unfused form ends in Divide(dot, 0.0)
      val q =
        """SELECT
          |  aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d,
          |            (acc, v) -> acc + v)
          |    / (sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), 0.0d,
          |                      (acc, v) -> acc + v))
          |     * sqrt(aggregate(zip_with(b, b, (x, y) -> x * y), 0.0d,
          |                      (acc, v) -> acc + v))) AS cs
          |FROM (SELECT array(CAST(id AS DOUBLE) * 0.0d, 0.0d) AS a,
          |             array(4.0d, 5.0d) AS b
          |      FROM range(1, 2))""".stripMargin
      def rootChain(t: Throwable): String = {
        val sb = new StringBuilder
        var cur: Throwable = t
        while (cur != null) { sb.append(cur.toString).append('\n'); cur = cur.getCause }
        sb.toString
      }
      s2.conf.set("spark.sql.ansi.enabled", "true")
      assert(s2.sql(q).queryExecution.optimizedPlan.toString.contains("cosine_sim"),
        "zero-norm case must still fuse under ANSI")
      val e = intercept[Throwable] { s2.sql(q).collect() }
      assert(rootChain(e).contains("DIVIDE_BY_ZERO"), rootChain(e))

      s2.conf.set("spark.sql.ansi.enabled", "false")
      val r = s2.sql(q).collect()(0)
      assert(r.isNullAt(0), s"non-ANSI zero-norm cosine must be NULL, got $r")

      // the Column-API wrapper is total: NULL, never an error, even in ANSI
      s2.conf.set("spark.sql.ansi.enabled", "true")
      import s2.implicits._
      val viaCol = Seq((Array(0.0, 0.0), Array(4.0, 5.0))).toDF("a", "b")
        .select(CosineSimExpr.cosineSim(col("a"), col("b")).as("cs"))
        .collect()(0)
      assert(viaCol.isNullAt(0))
      s2.conf.unset("spark.sql.ansi.enabled")
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }

  test("SparkSessionExtensions injection registers the functions at build time") {
    // a sibling session on the same context, built THROUGH the extensions
    // path (the cluster deployment shape: spark.sql.extensions=...)
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s2.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect()(0).getDouble(0)
      assert(r == 11.0)
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }
}
