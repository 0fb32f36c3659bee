package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data-quality constraint audit — the validation gate a corpus passes
  * BEFORE any training pipeline consumes it. The reference's only data
  * contract is implicit (its apps assume `"key value"` lines and crash
  * otherwise, /root/reference/src/main/test-mr.sh golden diffs); a 100 TB
  * engine needs the contract explicit and checked as a first-class
  * operator, because a constraint violation discovered mid-training costs
  * a full re-run.
  *
  * Architecture (the Deequ/"unit tests for data" shape, Schelter et al.
  * 2018, VLDB — public literature): every ROW-LOCAL check over a table is
  * compiled into ONE shared aggregate pass (`sum(when(violated, 1))` per
  * check — the scan is read once no matter how many checks ride it);
  * cross-table referential checks are anti-joins (broadcast when the
  * parent is a dimension, shuffle otherwise — Catalyst picks); uniqueness
  * is a count-distinct with map-side partials. Output is the audit ledger:
  * one row per check with violation and population counts.
  */
object Audit {
  import Tables.{apply => t}

  /** The document-table row checks, shared by the batch audit and the
    * streaming ingest-gate twin (EventStreams.auditIngest). */
  private[graft] def documentChecks: Seq[(String, Column)] = Seq(
    "doc_text_nonempty" -> (col("text").isNull || length(col("text")) === 0),
    "doc_len_consistent" -> (col("n_chars") =!= length(col("text"))))

  /** Fold N named row-predicates over one table into a single aggregate
    * pass, then explode the 1-row result into (check_name, violations)
    * ledger rows. Streaming-safe: one aggregate + a projection. */
  private[graft] def rowChecks(df: DataFrame, tbl: String,
      checks: Seq[(String, Column)]): DataFrame = {
    val aggs = checks.map { case (name, bad) =>
      sum(when(bad, 1L).otherwise(0L)).as(name)
    } :+ count(lit(1)).as("__total")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.map { case (name, _) =>
        struct(lit(name).as("check_name"), col(name).as("violations"))
      }: _*)).as("c"), col("__total"))
      .select(col("c.check_name"), lit(tbl).as("tbl"),
        col("c.violations"), col("__total").as("total"))
  }

  /** One referential-integrity ledger row: child rows whose `childKey`
    * has no match in the parent's `parentKey`. Null child keys count as
    * violations too (a null FK is a missing parent). */
  private def fkCheck(name: String, child: DataFrame, childKey: String,
      childTbl: String, parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey),
        "left_anti")
    orphans.agg(count(lit(1)).as("violations"))
      .crossJoin(child.agg(count(lit(1)).as("total")))
      .select(lit(name).as("check_name"), lit(childTbl).as("tbl"),
        col("violations"), col("total"))
  }

  /** One uniqueness ledger row: duplicate key instances =
    * count(*) − count(distinct key). */
  private def uniqueCheck(name: String, df: DataFrame, key: String,
      tbl: String): DataFrame =
    df.agg(
        (count(lit(1)) - countDistinct(col(key))).as("violations"),
        count(lit(1)).as("total"))
      .select(lit(name).as("check_name"), lit(tbl).as("tbl"),
        col("violations"), col("total"))

  /** q162 — the corpus constraint audit: 12 checks over 5 tables.
    * Row-local domain/range/completeness checks share one scan per table;
    * FK checks are anti-joins; uniqueness is count-distinct; the
    * embeddings dimension-uniformity check compares every row against the
    * table's min dimension (a 1-row broadcast, the scalar-subquery
    * pattern). Output: (check_name, tbl, violations, total, pass). */
  def q162(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val d = t(spark, dir, "documents")
    val e = t(spark, dir, "embeddings")

    val liChecks = rowChecks(li, "lineitem", Seq(
      "li_qty_range" -> (col("l_quantity") < 1.0 || col("l_quantity") > 50.0),
      "li_returnflag_domain" -> !col("l_returnflag").isin("A", "N", "R"),
      "li_price_nonneg" -> (col("l_extendedprice") < 0.0),
      "li_discount_range" -> (col("l_discount") < 0.0 || col("l_discount") > 1.0)))
    val oChecks = rowChecks(o, "orders", Seq(
      "ord_date_complete" -> col("o_orderdate").isNull,
      "ord_status_domain" -> !col("o_orderstatus").isin("O", "F", "P")))
    val dChecks = rowChecks(d, "documents", documentChecks)

    val minDim = e.agg(min(size(col("embedding"))).as("min_dim"))
    val eDim = e.crossJoin(broadcast(minDim))
      .agg(
        sum(when(size(col("embedding")) =!= col("min_dim"), 1L)
          .otherwise(0L)).as("violations"),
        count(lit(1)).as("total"))
      .select(lit("emb_dim_uniform").as("check_name"),
        lit("embeddings").as("tbl"), col("violations"), col("total"))

    Seq(
      liChecks, oChecks, dChecks,
      fkCheck("ord_custkey_fk", o, "o_custkey", "orders", c, "c_custkey"),
      fkCheck("li_orderkey_fk", li, "l_orderkey", "lineitem", o, "o_orderkey"),
      uniqueCheck("cust_key_unique", c, "c_custkey", "customer"),
      uniqueCheck("doc_id_unique", d, "doc_id", "documents"),
      eDim)
      .reduce(_.unionByName(_))
      .withColumn("pass", col("violations") === 0L)
      .orderBy(col("check_name"))
  }
}
