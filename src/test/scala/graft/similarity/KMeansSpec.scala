package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.queries.EmbeddingQueries

class KMeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("assignment partitions the corpus: sizes sum to N, k clusters max") {
    val vecs = EmbeddingQueries.vecs(spark, dir)
    val n = vecs.count()
    val summary = KMeans.q48(spark, dir, k = 10, iters = 2).collect()
    assert(summary.map(_.getLong(1)).sum == n)
    assert(summary.length <= 10)
  }

  test("Lloyd iterations do not degrade the spherical objective") {
    val vecs = EmbeddingQueries.vecs(spark, dir)
    def objective(iters: Int): Double = {
      val model = KMeans.fit(vecs, k = 8, iters = iters)
      KMeans.assign(vecs, model)
        .agg(avg(col("sim"))).collect()(0).getDouble(0)
    }
    val one = objective(1)
    val three = objective(3)
    assert(three >= one - 1e-6, s"objective degraded: $one -> $three")
  }

  test("fit is deterministic across runs") {
    val vecs = EmbeddingQueries.vecs(spark, dir)
    def run(): Seq[(Int, Seq[Double])] =
      KMeans.fit(vecs, k = 5, iters = 2)
        .orderBy(col("cluster")).collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).toSeq
    assert(run() == run())
  }
}
