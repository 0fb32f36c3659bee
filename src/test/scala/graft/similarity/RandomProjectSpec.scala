package graft.similarity

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTest
import graft.functions.RandomProjectExpr

/** The property q137's oracle can't see: the projection PRESERVES
  * geometry (that's why the op exists), and the codegen path agrees with
  * the interpreted evaluator. */
class RandomProjectSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("JL projection preserves squared norms in aggregate (E||p||^2 = ||v||^2)") {
    import graft.queries.EmbeddingQueries
    val v = EmbeddingQueries.vecs(spark, dir)
      .withColumn("p", RandomProjectExpr.project(col("v"), 16))
    val dot = (c: org.apache.spark.sql.Column) =>
      aggregate(zip_with(c, c, (a, b) => a * b), lit(0.0d), (acc, x) => acc + x)
    val stats = v.select(
        (dot(col("p")) / dot(col("v"))).as("ratio"))
      .where(col("ratio").isNotNull)
      .agg(avg("ratio").as("mean_ratio"), count(lit(1)).as("n")).head()
    val mean = stats.getDouble(0)
    assert(stats.getLong(1) > 100)
    // k = 16 is a coarse sketch; the MEAN ratio over hundreds of vectors
    // concentrates tightly around 1
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean")
  }

  test("codegen and interpreted evaluation agree bit-for-bit") {
    val expr = RandomProjectExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array.tabulate(64)(i => math.sin(i * 1.7) * (i % 5 - 2)),
        ArrayType(DoubleType, containsNull = false)), 16)
    val interpreted = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
    // drive the codegen path through a real projection over a DataFrame
    import spark.implicits._
    val fromDf = Seq(Array.tabulate(64)(i => math.sin(i * 1.7) * (i % 5 - 2)))
      .toDF("v")
      .select(RandomProjectExpr.project(col("v"), 16).as("p"))
      .head().getSeq[Double](0).toArray
    assert(interpreted.toSeq === fromDf.toSeq)
  }
}
