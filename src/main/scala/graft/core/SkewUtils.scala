package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation utilities. AQE's skew-join handling
  * (spark.sql.adaptive.skewJoin) covers sort-merge joins at runtime; these
  * are the *declared* forms for when a key's skew is known a priori (the
  * classic hot-key problem at 100 TB: one user/doc/url holding 1% of the
  * fact table).
  */
object SkewUtils {

  /** Salted equi-join of a skewed (large) side against a small-ish side:
    * the large side gets a deterministic salt derived from its OTHER
    * columns' hash; the small side is replicated nSalts times. Same result
    * as a plain equi-join, but the hot key's rows spread over nSalts
    * shuffle partitions instead of one.
    *
    * Deterministic: salt = pmod(xxhash64(all large-side columns), nSalts)
    * — no RNG, stable under retries (a rand()-based salt breaks
    * exactly-once under task re-execution).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 nSalts: Int, joinType: String = "inner"): DataFrame =
    saltedJoin(large, small, Seq(key), nSalts, joinType)

  /** Multi-column-key form of [[saltedJoin]] (q104 joins bigram rows on
    * (w1, w2) then on (w1), both skewed at stop-word contexts). */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 nSalts: Int, joinType: String): DataFrame = {
    // right/full outer would surface each unmatched replicated small-side
    // row nSalts times — only large-side-preserving types are sound here
    require(Set("inner", "left", "left_outer", "leftouter", "semi",
      "left_semi", "leftsemi", "anti", "left_anti", "leftanti")
      .contains(joinType.toLowerCase(java.util.Locale.ROOT)),
      s"saltedJoin does not support $joinType (small side is replicated)")
    val largeCols = large.columns.map(col)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(largeCols: _*), lit(nSalts.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Inner salted join with Scala-default-friendly arity (Seq-key callers
    * that want the default join type). */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 nSalts: Int): DataFrame =
    saltedJoin(large, small, keys, nSalts, "inner")

  /** Two-phase (salted) aggregation for skewed group keys with
    * non-algebraic aggregates: phase 1 groups by (key, salt) computing the
    * partial, phase 2 merges partials per key. For algebraic aggregates
    * (sum/count/min/max) Spark's partial aggregation already does this —
    * use this form for collect_set-style holistic aggregates over hot keys.
    */
  def saltedCollectSet(df: DataFrame, key: String, valueCol: String,
                       nSalts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(nSalts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(collect_set(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(array_distinct(flatten(collect_list(col("__partial")))).as("values"))
}
