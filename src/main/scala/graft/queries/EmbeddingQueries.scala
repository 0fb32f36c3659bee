package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Embedding-column queries over `embeddings` (vec_id, embedding
  * list<float>, label) — Q22 of SURVEY.md §2.4 plus the similarity-search
  * groundwork used by graft.similarity.
  */
object EmbeddingQueries {
  import Tables.{apply => t}

  /** Q23 — array ops on the embedding column (SURVEY Q22): schema sanity,
    * proves list<float> round-trips. */
  def q23(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(
        col("vec_id"), col("label"),
        size(col("embedding")).cast(IntegerType).as("dim"))
      .orderBy(col("vec_id"))
      .limit(50)

  /** Cosine similarity of two double-array columns as a pure codegen'd
    * expression graph: zip_with for the elementwise product, aggregate for
    * the fold — left-to-right, deterministic order (no shuffle-order
    * dependence, unlike SUM over exploded elements). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    def norm(x: Column): Column = sqrt(dot(x, x))
    dot(a, b) / (norm(a) * norm(b))
  }

  /** Embedding cast float→double once, up front (all arithmetic in f64). */
  def vecs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(
        col("vec_id"), col("label"),
        transform(col("embedding"), _.cast(DoubleType)).as("v"))
}
