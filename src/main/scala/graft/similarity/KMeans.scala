package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.EmbeddingQueries

/** Spherical k-means (cosine objective) as pure iterated DataFrame graphs —
  * Lloyd's algorithm with no driver-side math:
  *
  *  - init: the k lowest vec_ids (deterministic, no RNG)
  *  - assign: broadcast centroids × corpus, argmax cosine via the native
  *    CosineSimExpr, ties broken by cluster id (row_number)
  *  - update: per-cluster elementwise mean, folded over a SORTED
  *    collect_list so float accumulation order is deterministic
  *
  * Each iteration is one broadcast join + one aggregate. At 100 TB you
  * would checkpoint the assignment between iterations (the plan grows
  * linearly with iters); k stays driver-free either way.
  */
object KMeans {

  /** Returns (cluster, centroid: array<double>) after `iters` Lloyd steps. */
  def fit(vecs: DataFrame, k: Int, iters: Int, dim: Int = 64): DataFrame = {
    var centroids = vecs.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"), col("v"))
      .withColumn("cluster",
        row_number().over(Window.orderBy(col("vec_id"))).cast(IntegerType) - 1)
      .select(col("cluster"), col("v").as("centroid"))

    (1 to iters).foreach { _ =>
      val assigned = assign(vecs, centroids)
      centroids = assigned
        .groupBy(col("cluster"))
        .agg(
          sort_array(collect_list(struct(col("vec_id"), col("v")))).as("rows"),
          count(lit(1)).as("cnt"))
        .select(col("cluster"),
          transform(
            aggregate(col("rows"), array_repeat(lit(0.0d), dim),
              (acc, r) => zip_with(acc, r.getField("v"), (p, q) => p + q)),
            x => x / col("cnt")).as("centroid"))
    }
    centroids
  }

  /** Nearest-centroid assignment: (vec_id, v, cluster, sim). */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("cluster"))
    vecs.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("v"), col("cluster"),
        EmbeddingQueries.cosine(col("v"), col("centroid")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
  }

  /** q47 — k-means clustering summary: cluster sizes + mean within-cluster
    * cosine (the spherical k-means objective), rounded. Deterministic
    * (fixed init, ordered folds) but hash/float-pipeline dependent — no
    * cross-engine oracle; invariants are spec-tested. */
  def q47(spark: SparkSession, dir: String, k: Int = 10, iters: Int = 3): DataFrame = {
    val vecs = EmbeddingQueries.vecs(spark, dir)
    val model = fit(vecs, k, iters)
    assign(vecs, model)
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("sim").cast(DecimalType(20, 8))).cast(DoubleType) /
          count(lit(1)), 4).as("mean_cos"))
      .orderBy(col("cluster"))
  }
}
