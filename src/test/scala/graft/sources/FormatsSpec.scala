package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.core.Tables

/** Round-trip every format on a representative slice of the star schema:
  * what goes out must come back value-identical. */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTest.spark
  private val dir = SparkTest.sf0001

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.orderBy(col("o_orderkey")).collect().map(_.toSeq.map {
      case d: java.sql.Timestamp => d.getTime
      case x => x
    }).toSeq

  private lazy val orders = Tables(spark, dir, "orders")

  test("parquet round-trip is loss-free") {
    val p = Files.createTempDirectory("fmt").toString + "/o"
    Formats.writeParquet(orders, p)
    assert(canon(Formats.readParquet(spark, p)) == canon(orders))
  }

  test("orc round-trip is loss-free") {
    val p = Files.createTempDirectory("fmt").toString + "/o"
    Formats.writeOrc(orders, p)
    assert(canon(Formats.readOrc(spark, p)) == canon(orders))
  }

  test("csv round-trip with explicit schema is loss-free") {
    val p = Files.createTempDirectory("fmt").toString + "/o"
    Formats.writeCsv(orders, p)
    assert(canon(Formats.readCsv(spark, p, orders.schema)) == canon(orders))
  }

  test("json round-trip with explicit schema is loss-free") {
    val p = Files.createTempDirectory("fmt").toString + "/o"
    Formats.writeJson(orders, p)
    assert(canon(Formats.readJson(spark, p, orders.schema)) == canon(orders))
  }

  test("parquet codec round-trip: zstd and snappy read back identically") {
    // codec is a storage-layer choice; values must be invariant under it
    // (and a 100 TB corpus cares: zstd typically halves the footprint)
    for ((codec, ext) <- Seq("zstd" -> "zstd", "snappy" -> "snappy",
        "gzip" -> "gz")) {
      val p = Files.createTempDirectory("fmt").toString + s"/o_$codec"
      orders.write.option("compression", codec).parquet(p)
      assert(canon(spark.read.parquet(p)) == canon(orders), s"codec $codec")
      val files = new java.io.File(p).listFiles.map(_.getName)
      assert(files.exists(_.contains(s".$ext.")), s"no .$ext. file: ${files.toSeq}")
    }
  }

  test("parquet schema evolution: mergeSchema unions columns across file generations") {
    // generation 1 lacks the column generation 2 adds — the ingest reality
    // of any long-lived corpus; mergeSchema must union the schemas and
    // null-fill the missing column in old files
    val base = Files.createTempDirectory("fmt").toString + "/evolve"
    orders.select(col("o_orderkey"), col("o_custkey"))
      .write.parquet(base + "/gen=1")
    orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"))
      .write.parquet(base + "/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert(merged.columns.toSet == Set("o_orderkey", "o_custkey", "o_totalprice", "gen"))
    val n = orders.count()
    assert(merged.count() == 2 * n)
    // old generation reads the new column as null; new generation keeps values
    assert(merged.where(col("gen") === 1 && col("o_totalprice").isNull).count() == n)
    assert(merged.where(col("gen") === 2 && col("o_totalprice").isNotNull).count() == n)
  }

  test("jdbc round-trip (embedded Derby) preserves decimal and timestamp fidelity") {
    val tmp = Files.createTempDirectory("derby").toString
    // keep Derby's home + log out of the repo cwd
    System.setProperty("derby.system.home", tmp)
    System.setProperty("derby.stream.error.file", tmp + "/derby.log")
    val url = s"jdbc:derby:$tmp/db;create=true"
    // the fidelity-sensitive types: exact DECIMAL and a timestamp (the NTZ
    // source casts to instant — Derby TIMESTAMP has no NTZ flavor; with the
    // UTC session the wall-clock values are identical)
    val src = orders.select(
      col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2))
        .as("price_dec"),
      col("o_orderdate").cast(org.apache.spark.sql.types.TimestampType).as("ts"))
    Formats.writeJdbc(src, url, "orders_rt")
    val back = Formats.readJdbc(spark, url, "orders_rt")
    // schema fidelity: precision/scale and the timestamp type survive
    assert(back.schema("price_dec").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2), back.schema.treeString)
    assert(back.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType, back.schema.treeString)
    assert(canon(back) == canon(src))
    // bounded parallel read: same rows, requested split count
    val part = Formats.readJdbcPartitioned(spark, url, "orders_rt",
      "o_orderkey", 0L, 1L << 20, 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(canon(part) == canon(src))
  }

  test("text round-trip preserves lines (reference format)") {
    val p = Files.createTempDirectory("fmt").toString + "/t"
    val lines = orders.select(
      concat_ws(" ", col("o_orderkey"), col("o_orderstatus")).as("value"))
    Formats.writeText(lines, p)
    assert(Formats.readText(spark, p).collect().map(_.getString(0)).sorted.toSeq
      == lines.collect().map(_.getString(0)).sorted.toSeq)
  }

  test("q205 merged-schema read reconciles both writer generations; old files surface NULL priority") {
    val rows = Formats.q205(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val pre = orders.where(year(col("o_orderdate")) < 1998).count()
    val post = orders.where(year(col("o_orderdate")) >= 1998).count()
    // the pre-upgrade generation's rows all land in the NULL-priority
    // bucket, and the evolved column's rows are fully accounted for
    val byP = rows.map(r => r._1 -> r._2).toMap
    assert(byP("(pre-upgrade)") === pre,
      "old-generation rows must surface as NULL priority")
    assert(rows.map(_._2).sum === pre + post,
      "the merged read must cover every row of both generations")
    assert(rows.count(_._1 != "(pre-upgrade)") >= 2,
      "evolved files must carry real priorities")
    assert(rows.forall(_._3 > 0.0))
  }
}
