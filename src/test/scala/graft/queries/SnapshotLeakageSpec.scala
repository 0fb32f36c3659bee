package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkTest

/** Delta semantics (q140) and leakage-audit sanity (q141). */
class SnapshotLeakageSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("q140 delta statuses are exhaustive, disjoint, and consistent with the derivation") {
    val out = Layout.q140(spark, dir)
    val byStatus = out.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.keySet === Set("added", "removed", "changed"))
    // derivation invariants: removed ⇔ id ≡ 0 (mod 17); added ⇔ re-ingested
    // under id + 1e6; changed ⇔ id ≡ 0 (mod 13) and survived removal
    assert(out.where(col("status") === "removed" &&
      pmod(col("doc_id"), lit(17L)) =!= 0L).count() === 0L)
    assert(out.where(col("status") === "added" &&
      col("doc_id") < 1000000L).count() === 0L)
    assert(out.where(col("status") === "changed" &&
      (pmod(col("doc_id"), lit(13L)) =!= 0L ||
        pmod(col("doc_id"), lit(17L)) === 0L)).count() === 0L)
    // fingerprint columns null exactly per status
    assert(out.where(col("status") === "added" && col("fp1").isNotNull)
      .count() === 0L)
    assert(out.where(col("status") === "removed" && col("fp2").isNotNull)
      .count() === 0L)
    assert(out.where(col("status") === "changed" &&
      (col("fp1").isNull || col("fp2").isNull || col("fp1") === col("fp2")))
      .count() === 0L)
  }

  test("q141 audits only validation docs and is non-degenerate on the fixture") {
    val out = graft.text.Decontaminate.q141(spark, dir)
    // every audited doc is in the 10% validation bucket
    assert(out.where((col("doc_id") * 48271L) % 2147483647L % 100 < 90)
      .count() === 0L)
    assert(out.where(col("n_leaky") > col("n_rare_grams")).count() === 0L)
    val leaked = out.where(col("leaked")).count()
    val clean = out.where(!col("leaked")).count()
    assert(leaked > 0 && clean > 0,
      s"fixture must exercise both outcomes (leaked=$leaked clean=$clean)")
  }
}
