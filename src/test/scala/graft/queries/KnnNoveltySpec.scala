package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest

/** q131 k-NN graph + q132 novelty specs: the bounded-aggregator ranking
  * vs its rank-window twin, and the novelty score's conservation
  * invariants. Cross-engine exactness is gated by the DuckDB oracles. */
class KnnNoveltySpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("q131 bounded-aggregator top-k equals the rank-window form") {
    import org.apache.spark.sql.expressions.Window
    val got = Ranking.q131(spark, dir)
    // window twin over the SAME symmetrized pair set (derived from the
    // operator's own ranked output would be circular — rebuild from
    // q119 at the q131 floor)
    val pairs = Ranking.q119(spark, dir, tau = 0.2)
      .select(col("d1"), col("d2"),
        round(col("cosine") * 1000000.0d).cast("long").as("cos_u"))
    val sym = pairs.select(col("d1").as("doc_id"), col("d2").as("nbr_id"), col("cos_u"))
      .unionByName(pairs.select(col("d2").as("doc_id"), col("d1").as("nbr_id"), col("cos_u")))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("cos_u").desc, col("nbr_id"))
    val expect = sym
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= 3)
      .select(col("doc_id"), col("rank"), col("nbr_id"),
        round(col("cos_u").cast("double") / 1000000.0d, 6).as("cosine"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "aggregator k-NN != window k-NN")
    // every edge's reverse direction exists in the symmetric candidate
    // set, so a doc listed as someone's neighbor has neighbors itself
    val docsWithNbrs = got.select(col("doc_id")).distinct()
    val listed = got.select(col("nbr_id").as("doc_id")).distinct()
    assert(listed.exceptAll(docsWithNbrs).isEmpty, "asymmetric k-NN graph")
  }

  test("q132 novelty conserves the corpus gram count and starts at 1.0") {
    val rows = graft.text.TextAnalysis.q132(spark, dir).collect()
    val withGrams = rows.filter(_.getAs[Long]("n_grams") > 0)
    // every distinct corpus gram is novel in EXACTLY one document
    val totalNovel = withGrams.map(_.getAs[Long]("n_novel")).sum
    val corpusGrams = graft.core.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        explode(org.apache.spark.sql.functions.transform(
          sequence(lit(1),
            size(graft.text.TextAnalysis.toks(col("text"))) - 2),
          i => concat_ws(" ",
            slice(graft.text.TextAnalysis.toks(col("text")), i, lit(3)))))
          .as("gram"))
      .where(size(graft.text.TextAnalysis.toks(col("text"))) >= 3)
      .select(col("gram")).distinct().count()
    assert(totalNovel == corpusGrams,
      s"novel-gram sum $totalNovel != corpus distinct $corpusGrams")
    // the earliest doc with grams is 100% novel by construction
    val first = withGrams.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("n_novel") == first.getAs[Long]("n_grams"))
    rows.foreach { r =>
      val (g, nv) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"))
      assert(nv >= 0 && nv <= g, s"doc ${r.getAs[Long]("doc_id")}")
    }
  }
}
