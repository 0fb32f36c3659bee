package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkTest}

/** Classifier-tier specs (q126–q128): the hashed-linear scorer's exact
  * arithmetic vs a driver-side Scala reference, the bounded-aggregator
  * cap vs its rank-window twin, and the mixture planner's budget
  * conservation. Value-level cross-engine correctness is gated by the
  * DuckDB oracles; these pin the engine-side invariants. */
class ClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  /** Reference re-implementation of the TokenHashExpr kernel (poly31 over
    * UTF-16 units + splitmix64 finalizer) and the classifier's
    * bucket/weight derivation, in plain Scala. */
  private def refHash(s: String): Long = {
    var p = 0L
    var i = 0
    while (i < s.length) { p = p * 31 + s.charAt(i); i += 1 }
    var x = p
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^= (x >>> 31)
    x
  }
  private def refWeight(word: String): Long = {
    val bucket = java.lang.Math.floorMod(refHash(word), Classifier.NumBuckets)
    java.lang.Math.floorMod(refHash(s"w#$bucket"), Classifier.WeightSpan) - 1000L
  }

  test("q126 score_sum matches the Scala reference kernel on every sf0.001 doc") {
    // Tokens come FROM the engine (tokenization itself is oracle-gated
    // elsewhere); what this isolates is the hash → bucket → weight → sum
    // chain inside the higher-order aggregate.
    val toks = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.toks(col("text")).as("w"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1))
      .toMap
    val got = Classifier.q126(spark, dir)
      .select(col("doc_id"), col("n_toks"), col("score_sum"), col("kept"))
      .collect()
    assert(got.length == toks.size)
    got.foreach { r =>
      val (id, nToks, sum, kept) =
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))
      val ws = toks(id)
      assert(nToks == ws.length, s"doc $id n_toks")
      val want = ws.map(refWeight).sum
      assert(sum == want, s"doc $id score_sum $sum != $want")
      assert(kept == (if (sum > 0) 1 else 0), s"doc $id kept")
    }
  }

  test("q126 weights span both signs and buckets collide less than 50%") {
    // sanity on the synthetic table: a degenerate all-positive (or
    // all-negative) weight table would make the filter vacuous
    val w = Classifier.q126(spark, dir)
    val kept = w.agg(sum(col("kept"))).head.getLong(0)
    val n = w.count()
    assert(kept > 0 && kept < n, s"degenerate filter: $kept of $n kept")
  }

  test("q127 bounded-aggregator cap equals the rank-window form") {
    import org.apache.spark.sql.expressions.Window
    val win = Window.partitionBy(col("source"))
      .orderBy(col("score_sum").desc, col("doc_id"))
    val expect = Classifier.scored(spark, dir)
      .select(col("source"), col("doc_id"), col("score_sum"),
        row_number().over(win).as("rank"))
      .where(col("rank") <= 15)
      .select(col("source"), col("rank").cast("int").as("rank"),
        col("doc_id"), col("score_sum"))
    val got = Classifier.q127(spark, dir)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "aggregator cap != window cap")
  }

  test("q128 conserves the budget and caps epochs") {
    val rows = Classifier.q128(spark, dir).collect()
    val budget = 2000000L
    val totalTarget = rows.map(_.getAs[Long]("target_tokens")).sum
    // floor allocation: within one unit per source of the exact budget
    assert(totalTarget <= budget, s"over budget: $totalTarget")
    assert(totalTarget > budget - rows.length.toLong * 1,
      s"under-allocated beyond floor slack: $totalTarget")
    rows.foreach { r =>
      val tgt = r.getAs[Long]("target_tokens")
      val nTok = r.getAs[Long]("n_tokens")
      val eff = r.getAs[Long]("effective_tokens")
      assert(eff == math.min(tgt, 4L * nTok), s"${r.getAs[String]("source")} cap")
      val epochs = r.getAs[Double]("epochs")
      assert(math.abs(epochs - tgt.toDouble / nTok) < 5e-5,
        s"${r.getAs[String]("source")} epochs")
    }
  }

  test("q126 plan is map-only: no exchange upstream of the presentation sort") {
    val plan = Classifier.q126(spark, dir).queryExecution.sparkPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // exactly the range-partition exchange of the final orderBy
    assert(exchanges.size <= 1, s"unexpected shuffles:\n$plan")
  }
}
