package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, LongType, StringType}

import graft.queries.TextQueries

/** Custom typed UDAF (the engine's `Aggregator` surface — SURVEY §2.3
  * "UDF/UDAF/UDTF"): exact top-k (count, id) pairs per group with a
  * deterministic order (count desc, id asc), merged associatively so it
  * composes with partial aggregation. Bounded buffer (≤ k entries) — at
  * 100 TB the shuffle moves at most k pairs per key, unlike a
  * collect-then-sort formulation.
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  // input (id, cnt); buffer/output sorted by (cnt desc, id asc), ≤ k

  private def trim(s: Seq[(Long, Long)]): Seq[(Long, Long)] =
    s.sortBy { case (id, cnt) => (-cnt, id) }.take(k)

  override def zero: Seq[(Long, Long)] = Seq.empty
  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    trim(buf :+ in)
  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(a ++ b)
  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}

/** Bounded per-group bottom-k by an ascending key — the exact-quota
  * stratified sampler's kernel. Same associative-merge posture as
  * [[TopKAggregator]]: the buffer never exceeds k entries, so partial
  * aggregation combines map-side and the shuffle moves ≤ k pairs per
  * (partition, group) — unlike a rank window partitioned by a
  * low-cardinality stratum, which funnels every stratum through one
  * task at 100 TB. */
class BottomKAggregator(k: Int)
  extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {
  // input (sortKey, id); buffer/output ascending (sortKey, id), ≤ k

  private def trim(s: Seq[(String, Long)]): Seq[(String, Long)] =
    s.sorted.take(k)

  override def zero: Seq[(String, Long)] = Seq.empty
  override def reduce(buf: Seq[(String, Long)], in: (String, Long)): Seq[(String, Long)] =
    trim(buf :+ in)
  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    trim(a ++ b)
  override def finish(r: Seq[(String, Long)]): Seq[(String, Long)] = r
  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

object TopKAggregator {
  /** q42 — top-3 documents per word by occurrence count, via the custom
    * Aggregator over a typed grouped Dataset. Oracle: ROW_NUMBER window. */
  def q42(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val agg = new TopKAggregator(3)
    val dc = TextQueries.tokens(spark, dir)
      .groupBy(col("word"), col("doc_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("doc_id"), col("cnt"))
      .as[(String, Long, Long)]
    dc.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("top"))
      .toDF("word", "top")
      .select(col("word"), posexplode(col("top")))
      .select(
        col("word"),
        (col("pos") + 1).cast(IntegerType).as("rank"),
        col("col._1").as("doc_id"),
        col("col._2").as("cnt"))
      .orderBy(col("word"), col("rank"))
  }

  /** q118 — EXACT-QUOTA stratified sample: exactly k documents per
    * source stratum, chosen deterministically as the k smallest
    * md5(doc_id) digests (the q115 permutation key — uniform, so the
    * quota is an unbiased sample; retry-stable and engine-portable,
    * which rand()-reservoir sampling is never). The fraction-based
    * stratified sampler (q44's bucket mix) can only target an EXPECTED
    * count; a data mix spec ("exactly 10k docs from src X for the
    * eval slice") needs the quota exact.
    *
    * Runs on [[BottomKAggregator]]: bounded buffers partial-aggregate
    * map-side, so each of the P input partitions ships ≤ k rows per
    * stratum — no per-stratum sort, no skewed window, regardless of how
    * large or how skewed the strata are. Oracle: ROW_NUMBER window. */
  def q118(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    val agg = new BottomKAggregator(k)
    graft.core.Tables(spark, dir, "documents")
      .select(col("source"),
        md5(col("doc_id").cast("string")).as("sample_key"),
        col("doc_id"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("picks"))
      .toDF("source", "picks")
      .select(col("source"), posexplode(col("picks")))
      .select(
        col("source"),
        (col("pos") + 1).cast(IntegerType).as("rk"),
        col("col._1").as("sample_key"),
        col("col._2").as("doc_id"))
      .orderBy(col("source"), col("rk"))
  }

  /** q149 — KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et
    * al. 2002; Beyer et al. 2007): per group, keep the k smallest hash
    * values of the distinct keys; the k-th smallest, as a fraction u_k
    * of the hash space, estimates the cardinality as (k−1)/u_k. The
    * order-statistics counterpart to HLL (q38) — same mergeable bounded
    * state, but built on the PORTABLE poly31+splitmix64 hash, so unlike
    * HLL the estimate itself is deterministic and oracle-EXACT: DuckDB
    * re-derives every hash, the k-th order statistic, and the estimate.
    *
    * Scale shape: one (group, key) DISTINCT (pair-keyed shuffle, no
    * low-cardinality funnel), then [[BottomKAggregator]] — bounded ≤ k
    * buffers that partial-aggregate map-side, so each input partition
    * ships ≤ k rows per group; no per-group sort or window anywhere.
    * The unsigned-hash sort key rides as a zero-padded 20-digit string
    * (fixed width ⇒ lexicographic ≡ numeric); the estimate divides two
    * exactly-representable doubles, identical IEEE ops in both engines.
    * Groups with < k distinct keys report their exact size (the sketch
    * holds everything). */
  def q149(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    import spark.implicits._
    val agg = new BottomKAggregator(k)
    val two64 = BigDecimal("18446744073709551616")
    val unsignedHash =
      TokenHashExpr.tokenHash(concat(lit("k#"), col("l_partkey").cast(StringType)))
        .cast(DecimalType(20, 0)) +
        when(TokenHashExpr.tokenHash(
          concat(lit("k#"), col("l_partkey").cast(StringType))) < 0,
          lit(two64)).otherwise(lit(BigDecimal(0)))
    val kept = graft.core.Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_partkey")).distinct()
      .select(col("l_returnflag"),
        lpad(unsignedHash.cast(DecimalType(20, 0)).cast(StringType), 20, "0")
          .as("hkey"),
        col("l_partkey"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("mins"))
      .toDF("l_returnflag", "mins")
    val exact = graft.core.Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_true"))
    kept.select(
        col("l_returnflag"),
        size(col("mins")).cast(LongType).as("n_kept"),
        // try_: a group smaller than k has no k-th value (guarded below)
        expr(s"try_element_at(mins, $k)._1").as("kth"))
      .join(exact, Seq("l_returnflag"))
      .select(
        col("l_returnflag"), col("n_true"), col("n_kept"),
        when(col("n_kept") < k, col("n_kept").cast(DoubleType))
          .otherwise(round(
            lit((k - 1).toDouble) /
              (col("kth").cast(DecimalType(20, 0)).cast(DoubleType) /
                lit(1.8446744073709552e19)), 4))
          .as("kmv_est"))
      .orderBy(col("l_returnflag"))
  }

  /** q150 — KMV SET ALGEBRA (theta-sketch semantics, Dasgupta et al.
    * 2016): the q149 sketches support union and intersection WITHOUT
    * revisiting the data. For each pair of groups: the union sketch is
    * the k smallest of the combined sketches with threshold
    * θ = u_k(union); every retained hash below θ is a uniform sample of
    * the union, so |A∩B| ≈ (matches below θ)·(union estimate)/(k−1) and
    * Jaccard ≈ matches/(k−1). All arithmetic on the portable hash —
    * deterministic, oracle-exact (union order statistic, match counts,
    * and both estimates recomputed in DuckDB).
    *
    * Scale shape: sketches build exactly as q149 (bounded BottomK over
    * the pair-distinct); the pair stage then runs on k-row SKETCHES, not
    * data — group-count² · k tiny rows, broadcast-joined. That is the
    * point: cross-source overlap questions at 100 TB collapse to sketch
    * arithmetic after one corpus pass. (Assumes every group ≥ k distinct
    * keys — true here and at any real scale; the under-k exact path is
    * q149's.) */
  def q150(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    import spark.implicits._
    val agg = new BottomKAggregator(k)
    val two64 = BigDecimal("18446744073709551616")
    val h = TokenHashExpr.tokenHash(
      concat(lit("k#"), col("l_partkey").cast(StringType)))
    val unsignedHash = h.cast(DecimalType(20, 0)) +
      when(h < 0, lit(two64)).otherwise(lit(BigDecimal(0)))
    val sketches = graft.core.Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_partkey")).distinct()
      .select(col("l_returnflag"),
        lpad(unsignedHash.cast(DecimalType(20, 0)).cast(StringType), 20, "0")
          .as("hkey"),
        col("l_partkey"))
      .as[(String, String, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("mins"))
      .toDF("flag", "mins")
      .select(col("flag"),
        expr("transform(mins, m -> m._1)").as("hs"))
    val a = sketches.select(col("flag").as("f1"), col("hs").as("h1"))
    val b = sketches.select(col("flag").as("f2"), col("hs").as("h2"))
    a.join(broadcast(b), col("f1") < col("f2"))
      .select(col("f1"), col("f2"),
        expr(s"array_sort(array_union(h1, h2))").as("u"),
        col("h1"), col("h2"))
      .select(col("f1"), col("f2"),
        element_at(col("u"), least(size(col("u")), lit(k)))
          .as("theta_key"),
        col("h1"), col("h2"))
      .select(col("f1"), col("f2"),
        // matches: hashes present in BOTH sketches and below theta
        expr(s"size(filter(array_intersect(h1, h2), x -> x < theta_key))")
          .cast(LongType).as("n_match"),
        (col("theta_key").cast(DecimalType(20, 0)).cast(DoubleType) /
          lit(1.8446744073709552e19)).as("theta"))
      .select(col("f1"), col("f2"), col("n_match"),
        round(lit((k - 1).toDouble) / col("theta"), 4).as("union_est"),
        round(col("n_match").cast(DoubleType) / lit((k - 1).toDouble), 4)
          .as("jaccard_est"),
        round((col("n_match").cast(DoubleType) / lit((k - 1).toDouble)) *
          (lit((k - 1).toDouble) / col("theta")), 4).as("intersect_est"))
      .orderBy(col("f1"), col("f2"))
  }
}
