package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

import graft.core.Tables

/** Recommendation / affinity operators over the retail star schema —
  * the workload class (item-item collaborative filtering, Sarwar et al.
  * 2001 WWW; Linden et al. 2003 IEEE IC, "Amazon.com recommendations" —
  * public literature) that turns the same purchase bipartite graph the
  * graph tier ranks (q226) into a per-item neighbor list.
  */
object Recommend {
  import Tables.{apply => t}

  /** q241 — ITEM-ITEM co-purchase cosine affinity, top-3 neighbors per
    * part: two parts are similar when the same customers buy both,
    * normalized by each part's customer count — `cos = co/√(n₁·n₂)`
    * over the distinct (customer, part) relation.
    *
    * Scale shape: pair generation is a customer-keyed self-join of the
    * per-customer basket, so its cost is Σ basket² — bounded
    * STRUCTURALLY by capping each basket at 256 parts (deterministic:
    * the lowest part keys; a power-account with 10⁶ order lines
    * otherwise contributes 10¹² pairs). The cap is the declared
    * estimator at scale; RecommendSpec asserts it does NOT bind on the
    * fixtures, so the oracle (which replicates the cap) is exact
    * end-to-end here. Counts are exact integers; the cosine divides
    * once per pair; the per-part top-3 is a rank window PARTITIONED by
    * part (never global). */
  def q241(spark: SparkSession, dir: String, cap: Int = 256, k: Int = 3)
      : DataFrame = {
    val edges = t(spark, dir, "orders")
      .join(t(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    val capped = edges
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("c")).orderBy(col("p"))))
      .where(col("rn") <= cap)
      .select(col("c"), col("p"))
      .localCheckpoint() // pair join + part counts share one derivation
    try {
      val n = capped.groupBy(col("p")).agg(count(lit(1)).as("n"))
      val co = capped.as("a").join(capped.as("b"),
          col("a.c") === col("b.c") && col("a.p") < col("b.p"))
        .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
        .agg(count(lit(1)).as("co"))
      val sym = co.select(col("p1").as("part"), col("p2").as("other"),
          col("co"))
        .union(co.select(col("p2").as("part"), col("p1").as("other"),
          col("co")))
      val scored = sym
        .join(n.select(col("p").as("part"), col("n").as("n1")), Seq("part"))
        .join(n.select(col("p").as("other"), col("n").as("n2")), Seq("other"))
        .select(col("part"), col("other"), col("co"),
          round(col("co").cast(DoubleType) /
            sqrt(col("n1").cast(DoubleType) * col("n2").cast(DoubleType)),
            6).as("cosine"))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("part"))
            .orderBy(col("cosine").desc, col("co").desc, col("other"))))
        .where(col("rank") <= k)
        .select(col("part"), col("rank").cast(IntegerType), col("other"),
          col("co"), col("cosine"))
        .orderBy(col("part"), col("rank"))
        .localCheckpoint()
    } finally {
      org.apache.spark.sql.graftbridge.Bridge
        .unpersistLocalCheckpoint(capped)
    }
  }
}
