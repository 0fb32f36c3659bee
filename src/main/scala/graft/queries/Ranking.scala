package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Term-weighting / relevance-ranking operators over `documents` — the
  * retrieval side of a training-data pipeline (dedup picks what to drop,
  * ranking picks what to keep / surface). The reference has no scoring of
  * any kind (its apps are count/index aggregations, mrapps/wc.go,
  * indexer.go); these compose the q19/q20 token machinery with windowed
  * top-k and exact-decimal reductions.
  *
  * Float discipline (same as q67): every per-term double is computed in
  * ONE deterministic arithmetic order shared with the oracle SQL, summed
  * exactly as DECIMAL when an order-dependent float sum would otherwise
  * appear, and ROUND(..,6)-ed at the boundary. `ln` is the one
  * non-correctly-rounded primitive (measured: 4/5001 idf inputs differ
  * by 1 ulp between JVM and DuckDB libm) — the 6-decimal round absorbs
  * ulp wobble, and ranking ties break on the ROUNDED score then the term,
  * never on raw float order.
  */
object Ranking {

  /** (doc_id, word, tf) — term frequency per document. One explode + one
    * partial-agg shuffle keyed by (doc_id, word). */
  private def tf(spark: SparkSession, dir: String): DataFrame =
    graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z]+")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))

  /** q73 — TF-IDF: top-5 terms per document by smoothed tf-idf
    * (sklearn-style idf = ln((N+1)/(df+1)) + 1, N = all documents).
    *
    * Plan shape at 100 TB: tf is a (doc,word) aggregate; df reuses the SAME
    * aggregate output grouped by word (no second scan of documents); the
    * doc count is a 1-row broadcast; the per-doc top-5 is a bounded
    * row_number window partitioned by doc_id — every shuffle is keyed and
    * partial-aggregated, nothing global except the 1-row count. */
  def q73(spark: SparkSession, dir: String): DataFrame = {
    val t = tf(spark, dir)
    val df_ = t.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val nDocs = graft.core.Tables(spark, dir, "documents")
      .agg(count(lit(1)).as("n_docs"))
    val score = round(
      col("tf").cast(DoubleType) *
        (log((col("n_docs").cast(DoubleType) + 1.0d) /
          (col("df").cast(DoubleType) + 1.0d)) + 1.0d), 6)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    t.join(df_, Seq("word"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("word").as("term"), col("tf"), col("df"),
        score.as("score"))
      .withColumn("rank", row_number().over(w).cast(IntegerType))
      .where(col("rank") <= 5)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"),
        col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** q74 — BM25 ranking (k1 = 1.2, b = 0.75) of all documents against a
    * fixed conjunctive-or query ("scan data merge"), top 25.
    *
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) over N = docs with ≥1
    * token; per-(doc,term) partial scores are rounded to 8 decimals and
    * summed as DECIMAL so the 3-term sum is order-independent (a raw
    * double Σ would depend on Spark's reduction order). The query-term
    * filter lands before the df/tf joins, so the joined relation is
    * |terms|·|docs-containing-them| — never the full posting table. */
  def q74(spark: SparkSession, dir: String,
          terms: Seq[String] = Seq("scan", "data", "merge")): DataFrame = {
    val k1 = 1.2d
    val b = 0.75d
    val t = tf(spark, dir)
    val dl = t.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl"))
    val qt = t.where(col("word").isin(terms: _*))
    val df_ = qt.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0d) +
      (col("n_docs").cast(DoubleType) - col("df").cast(DoubleType) + 0.5d) /
        (col("df").cast(DoubleType) + 0.5d))
    val tfNorm = (col("tf").cast(DoubleType) * lit(k1 + 1.0d)) /
      (col("tf").cast(DoubleType) +
        lit(k1) * (lit(1.0d - b) + lit(b) * col("dl").cast(DoubleType) / col("avgdl")))
    qt.join(df_, Seq("word"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(idf * tfNorm, 8).cast(DecimalType(18, 8)).as("part"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("part")).cast(DoubleType), 6).as("bm25"),
        count(lit(1)).cast(IntegerType).as("n_terms_hit"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(25)
  }
}
