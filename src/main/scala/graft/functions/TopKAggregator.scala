package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

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
}
