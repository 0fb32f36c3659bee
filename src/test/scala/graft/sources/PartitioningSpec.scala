package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.core.Tables

/** Hive-style partitioned layouts: a filter on the partition column must
  * prune at planning time (PartitionFilters), not scan-and-filter — the
  * difference between reading 1/N and all of a 100 TB table. */
class PartitioningSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  test("partitionBy write + partition-pruned read") {
    val out = Files.createTempDirectory("part").toString + "/events"
    Tables(spark, dir, "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)

    val one = spark.read.parquet(out).where(col("event_type") === "click")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("event_type"), "no partition pruning:\n" + plan.take(1000))

    // pruned read returns exactly that partition's rows
    val expected = Tables(spark, dir, "events")
      .where(col("event_type") === "click").count()
    assert(one.count() == expected && expected > 0)
  }

  test("dynamic partition overwrite replaces only the written partition") {
    // production reality: re-running one day/type's pipeline must replace
    // THAT partition only — static overwrite mode clobbers the whole
    // table (every other partition silently vanishes)
    import spark.implicits._
    val key = "spark.sql.sources.partitionOverwriteMode"
    val saved = spark.conf.get(key)
    val out = Files.createTempDirectory("dpo").toString + "/events"
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("event_type"))
    ev.write.partitionBy("event_type").mode("overwrite").parquet(out)
    val types = ev.select("event_type").distinct().as[String].collect().sorted
    assert(types.length >= 2)
    val target = types.head
    val before = spark.read.parquet(out).count()
    try {
      spark.conf.set(key, "dynamic")
      // rewrite ONE partition with a single sentinel row
      Seq((-1L, target)).toDF("event_id", "event_type")
        .write.partitionBy("event_type").mode("overwrite").parquet(out)
      val after = spark.read.parquet(out)
      // the target partition holds exactly the sentinel…
      assert(after.where(col("event_type") === target).count() == 1)
      assert(after.where(col("event_id") === -1L).count() == 1)
      // …and every other partition is untouched
      val untouchedWant = ev.where(col("event_type") =!= target).count()
      assert(after.where(col("event_type") =!= target).count() == untouchedWant)
      assert(after.count() == untouchedWant + 1)
      assert(after.count() < before)
    } finally spark.conf.set(key, saved)
  }

  test("dynamic partition pruning: dim filter prunes the fact scan at runtime") {
    import spark.implicits._
    // The 100 TB case static pruning can't reach: the partition keys to
    // keep are only known by JOINING a filtered dimension. Spark's DPP
    // rewrites the fact scan's PartitionFilters to a dynamicpruning
    // subquery fed by the (broadcast) dim — without it, the whole fact
    // table is read and filtered post-join.
    val out = Files.createTempDirectory("dpp").toString + "/events"
    Tables(spark, dir, "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(out)
    val fact = spark.read.parquet(out)

    val types = Tables(spark, dir, "events")
      .select("event_type").distinct().as[String].collect().sorted
    assert(types.length >= 2, s"need >=2 event types, got ${types.toSeq}")
    // dim maps every type to a category; the filter keeps exactly one
    // type. Must be a FILE-backed table: an in-memory LocalRelation gets
    // the filter constant-folded away, leaving no selective predicate for
    // the DPP rule to key on.
    val dimPath = Files.createTempDirectory("dpp-dim").toString + "/dim"
    types.zipWithIndex
      .map { case (t, i) => (t, if (i == 0) "keep" else "drop") }
      .toSeq.toDF("event_type", "category")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)

    val q = fact.join(dim, Seq("event_type"))
      .where(col("category") === "keep")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    q.collect() // execute so AQE finalizes the plan
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "no dynamicpruning subquery in plan:\n" + plan.take(2000))

    // parity with the statically-filtered equivalent
    val expected = Tables(spark, dir, "events")
      .where(col("event_type") === types.head).count()
    val got = q.collect()
    assert(got.length == 1 && got(0).getLong(1) == expected && expected > 0)
  }
}
