package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTest

/** Invariants for the temperature draw (q135) and entity linkage (q136)
  * that the value-level oracle can't express. */
class MixtureLinkageSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("q135 draws exactly min(quota, n_docs) per source and ranks are dense from 1") {
    val out = Curation.q135(spark, dir)
    val docs = graft.core.Tables(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val per = out.groupBy("source").agg(
      count(lit(1)).as("drawn"), max("rk").as("max_rk"), min("rk").as("min_rk"),
      first("quota").as("quota"))
      .join(docs, Seq("source"))
    assert(per.where(col("drawn") =!=
      least(col("quota"), col("n_docs"))).count() === 0L)
    assert(per.where(col("min_rk") =!= 1L || col("max_rk") =!= col("drawn"))
      .count() === 0L)
  }

  test("q135 temperature flattens: quota share of a big source <= its doc share") {
    val docs = graft.core.Tables(spark, dir, "documents")
      .groupBy("source").agg(count(lit(1)).as("n_docs"))
    val total = docs.agg(sum("n_docs")).head().getLong(0).toDouble
    val out = Curation.q135(spark, dir)
      .select("source", "quota", "weight").distinct()
      .join(docs, Seq("source"))
    // α = 0.5 compresses the distribution: any source holding more than
    // the mean doc share must hold a weight share no larger than its doc
    // share (sqrt is concave), and symmetric for below-mean sources.
    val viol = out.where(
      (col("n_docs") / total > lit(1.0) / out.count() &&
        col("weight") > col("n_docs") / total + 1e-9) ||
      (col("n_docs") / total < lit(1.0) / out.count() &&
        col("weight") < col("n_docs") / total - 1e-9)).count()
    assert(viol === 0L)
  }

  test("q136 canonical-entity linkage counts equal ground-truth record-pair counts") {
    val out = Advanced.q136(spark, dir)
    val p = graft.core.Tables(spark, dir, "part")
    // ground truth: for each matched name pair, count record pairs directly
    val gt = out.select("name1", "name2").collect().map { r =>
      val (n1, n2) = (r.getString(0), r.getString(1))
      val c1 = p.where(col("p_name") === n1).count()
      val c2 = p.where(col("p_name") === n2).count()
      ((n1, n2), c1 * c2)
    }.toMap
    val got = out.select("name1", "name2", "linked_pairs").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === gt)
    assert(got.nonEmpty, "fixture must produce at least one linked entity pair")
  }
}
